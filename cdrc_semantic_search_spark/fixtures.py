"""Deterministic synthetic fixtures: ``transcripts`` + ``entity_catalogue``.

Shapes mandated by FIXTURES.md / BASELINE.json ``input_hint``:

    transcripts(conv_id string, turn_idx int32, role string, text string,
                tool string, ts timestamp)
    entity_catalogue(entity_id, canonical_name, aliases array<string>,
                     description, entity_type, url, created)

Generation is a pure function of ``seed`` (numpy PCG64; no wall-clock, no
external data).  Turn text is templated with embedded entity mentions and
explicit predicate phrases, so the expected (subj, pred, obj) triples are
recorded exactly at generation time — they are the parity ground truth
(FIXTURES.md §3).  ~5% of conversations are "hot" (10–50× median turns)
and ~3% of entities are "hot" (sampled ~100× more often) to exercise the
skew paths.  A small fraction of mention surfaces are perturbed (one char
dropped) and NOT recorded as catalogue aliases — they exercise the
embedding-fallback linking path.

This file is the analog of the reference's corpus-building stage
(/root/reference/src/query_api.py:74-94: catalogue records → synthesized
note documents), collapsed into a deterministic generator.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

PREDICATES = ("relates_to", "located_in", "derived_from", "mentions", "uses_tool")

# predicate phrase as it appears in turn text (extraction anchors on these)
PRED_PHRASE = {
    "relates_to": "relates to",
    "located_in": "is located in",
    "derived_from": "is derived from",
    "mentions": "mentions",
    "uses_tool": "uses tool",
}

_NOUNS = [
    "index", "deprivation", "census", "mobility", "retail", "housing",
    "access", "health", "income", "population", "transport", "energy",
    "crime", "education", "employment", "broadband", "pollution", "green",
    "space", "loneliness", "ageing", "consumption", "footfall", "boundary",
]
_PLACES = [
    "Leeds", "London", "Manchester", "Bristol", "Glasgow", "Cardiff",
    "Liverpool", "Sheffield", "Newcastle", "Birmingham", "Nottingham",
    "Southampton", "Belfast", "Edinburgh", "Oxford", "Cambridge",
]
_ORGS = ["CDRC", "ONS", "UKDS", "OSM", "NHS", "DEFRA", "DfT", "HMRC"]
_TOOLS = ["search", "sql", "browser", "python", "geocoder", "profiler"]
_ROLES = ["user", "assistant"]

_FILLER = [
    "Could you take a look at this for me?",
    "Here is what I found so far.",
    "That seems consistent with the earlier results.",
    "Let me run another check on the data.",
    "Thanks, that answers my question.",
    "The aggregation finished without errors.",
    "I will summarise the findings in the next message.",
]


@dataclass
class Fixture:
    transcripts: pd.DataFrame
    entities: pd.DataFrame
    truth_triples: pd.DataFrame  # (conv_id, turn_idx, subj_entity_id, pred, obj_entity_id)


def _title_case(words: list[str]) -> str:
    return " ".join(w if w[0].isupper() else w.capitalize() for w in words)


def _make_entities(rng: np.random.Generator, n_entities: int) -> pd.DataFrame:
    base_ts = datetime(2025, 1, 1)
    rows = []
    seen_names: set[str] = set()
    for i in range(n_entities):
        etype = ["dataset", "place", "metric", "org", "tool"][i % 5]
        if etype == "place":
            name = str(rng.choice(_PLACES)) + " " + _title_case(
                [str(w) for w in rng.choice(_NOUNS, size=1)]
            ) + " Area"
        elif etype == "org":
            name = str(rng.choice(_ORGS)) + " " + _title_case(
                [str(w) for w in rng.choice(_NOUNS, size=2, replace=False)]
            ) + " Unit"
        elif etype == "tool":
            name = str(rng.choice(_TOOLS)).capitalize() + " " + _title_case(
                [str(w) for w in rng.choice(_NOUNS, size=1)]
            ) + " Tool"
        else:
            k = int(rng.integers(2, 4))
            name = _title_case([str(w) for w in rng.choice(_NOUNS, size=k, replace=False)])
            name += " Index" if etype == "metric" else " Dataset"
        # de-duplicate canonical names deterministically
        if name in seen_names:
            name = f"{name} {i:03d}"
        seen_names.add(name)

        aliases = []
        words = name.split()
        if len(words) >= 2:
            aliases.append("".join(w[0].upper() for w in words))  # initials
        aliases.append(name.lower())
        if len(name) > 8:
            drop = int(rng.integers(1, len(name) - 1))
            aliases.append(name[:drop] + name[drop + 1 :])  # typo variant
        # dedupe aliases, drop any that collide with the canonical name
        aliases = sorted({a for a in aliases if a and a != name})

        desc_words = [str(w) for w in rng.choice(_NOUNS, size=6, replace=False)]
        description = (
            f"{name} covers {' and '.join(desc_words[:2])} statistics. "
            f"It includes {', '.join(desc_words[2:5])} measures."
        )
        rows.append(
            {
                "entity_id": f"E{i:04d}",
                "canonical_name": name,
                "aliases": aliases,
                "description": description,
                "entity_type": etype,
                "url": f"https://example.org/entity/{i:04d}",
                "created": base_ts + timedelta(hours=i),
            }
        )
    return pd.DataFrame(rows)


def _entity_sampler(rng: np.random.Generator, entities: pd.DataFrame):
    """Skewed sampler: first 3% of entities are 'hot' (100× weight)."""
    n = len(entities)
    weights = np.ones(n)
    weights[: max(1, n * 3 // 100)] = 100.0
    weights /= weights.sum()
    ids = entities["entity_id"].to_numpy()
    names = entities["canonical_name"].to_numpy()
    aliases = entities["aliases"].to_list()
    types = entities["entity_type"].to_numpy()
    tool_idx = np.flatnonzero(types == "tool")
    place_idx = np.flatnonzero(types == "place")

    def sample(kind: str | None = None) -> int:
        if kind == "tool" and len(tool_idx):
            return int(rng.choice(tool_idx))
        if kind == "place" and len(place_idx):
            return int(rng.choice(place_idx))
        return int(rng.choice(n, p=weights))

    def surface(idx: int, perturb_rate: float) -> str:
        forms = [names[idx]] + list(aliases[idx])
        # favour the canonical form; aliases less often
        w = np.array([4.0] + [1.0] * len(aliases[idx]))
        s = str(forms[int(rng.choice(len(forms), p=w / w.sum()))])
        if rng.random() < perturb_rate and len(s) > 6:
            # unseen surface: drop one interior char (not in catalogue aliases)
            p = int(rng.integers(1, len(s) - 1))
            s = s[:p] + s[p + 1 :]
        return s

    return sample, surface, ids


def generate(
    seed: int = 42,
    n_conversations: int = 200,
    n_entities: int = 500,
    perturb_rate: float = 0.04,
) -> Fixture:
    rng = np.random.default_rng(seed)
    entities = _make_entities(rng, n_entities)
    sample, surface, ids = _entity_sampler(rng, entities)

    base_ts = datetime(2026, 1, 1)
    n_hot = max(1, n_conversations * 5 // 100)
    t_rows: list[tuple] = []
    truth: list[tuple] = []

    for c in range(n_conversations):
        conv_id = f"conv_{c:06d}"
        if c < n_hot:  # hot conversations: 10–50× the ~12-turn median
            n_turns = int(rng.integers(120, 600))
        else:
            n_turns = int(rng.integers(4, 24))
        ts = base_ts + timedelta(minutes=int(rng.integers(0, 300_000)))
        for t in range(n_turns):
            role = _ROLES[t % 2]
            tool = ""
            kind = rng.random()
            if kind < 0.35:
                text = str(rng.choice(_FILLER))
            elif kind < 0.50:
                i = sample()
                text = f"Tell me about {surface(i, perturb_rate)}."
            else:
                pred = PREDICATES[int(rng.integers(0, len(PREDICATES)))]
                if pred == "uses_tool":
                    si, oi = sample(), sample("tool")
                    role, tool = "tool", str(rng.choice(_TOOLS))
                elif pred == "located_in":
                    si, oi = sample(), sample("place")
                else:
                    si, oi = sample(), sample()
                while oi == si:  # KG has no self-loops; keep truth consistent
                    oi = sample("tool" if pred == "uses_tool" else "place" if pred == "located_in" else None)
                s_surf = surface(si, perturb_rate)
                o_surf = surface(oi, perturb_rate)
                phrase = PRED_PHRASE[pred]
                lead = str(rng.choice(["", "Note that ", "I found that ", "Records show "]))
                text = f"{lead}{s_surf} {phrase} {o_surf}."
                truth.append((conv_id, t, ids[si], pred, ids[oi]))
            ts = ts + timedelta(seconds=int(rng.integers(5, 120)))
            t_rows.append((conv_id, np.int32(t), role, text, tool, ts))

    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    truth_df = pd.DataFrame(
        truth, columns=["conv_id", "turn_idx", "subj_entity_id", "pred", "obj_entity_id"]
    )
    return Fixture(transcripts=transcripts, entities=entities, truth_triples=truth_df)


def to_spark(spark, fixture: Fixture):
    """Materialize fixture frames as Spark DataFrames with explicit schemas."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    t_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    e_schema = StructType(
        [
            StructField("entity_id", StringType()),
            StructField("canonical_name", StringType()),
            StructField("aliases", ArrayType(StringType())),
            StructField("description", StringType()),
            StructField("entity_type", StringType()),
            StructField("url", StringType()),
            StructField("created", TimestampType()),
        ]
    )
    tdf = spark.createDataFrame(fixture.transcripts, schema=t_schema)
    edf = spark.createDataFrame(fixture.entities, schema=e_schema)
    return tdf, edf
