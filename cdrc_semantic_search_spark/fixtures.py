"""Deterministic synthetic fixtures: ``transcripts`` + ``entity_catalogue``.

Shapes mandated by FIXTURES.md / BASELINE.json ``input_hint``:

    transcripts(conv_id string, turn_idx int32, role string, text string,
                tool string, ts timestamp)
    entity_catalogue(entity_id, canonical_name, aliases array<string>,
                     description, entity_type, url, created)

Generation is a pure function of ``seed`` with **per-conversation RNG
streams** (``default_rng((seed, 1, conv_idx))``), so the same corpus can
be produced either on the driver (``generate``, small scale, with ground
truth) or distributed across executors (``generate_spark``, bench scale)
— byte-identical rows either way.  No wall-clock, no external data.

Turn text is templated with embedded entity mentions and explicit
predicate phrases; expected (subj, pred, obj) triples are recorded at
generation time — the parity ground truth (FIXTURES.md §3).  ~5% of
conversations are "hot" (10–50× median turns) and ~3% of entities are
"hot" (~100× sampling weight) to exercise skew paths.  A small fraction
of mention surfaces are perturbed (one char dropped, not a catalogue
alias) to exercise embedding-fallback linking.

Analog of the reference's corpus-building stage
(/root/reference/src/query_api.py:74-94), collapsed into a generator.
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

_BASE_TS = datetime(2026, 1, 1)

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


@dataclass
class Fixture:
    transcripts: pd.DataFrame
    entities: pd.DataFrame
    truth_triples: pd.DataFrame  # (conv_id, turn_idx, subj_entity_id, pred, obj_entity_id)


@dataclass
class EntityPayload:
    """Compact catalogue arrays shipped to executors for generation."""

    ids: np.ndarray
    names: np.ndarray
    aliases: list[list[str]]
    weights: np.ndarray  # normalized sampling weights (hot-entity skew)
    tool_idx: np.ndarray
    place_idx: np.ndarray


def _title_case(words: list[str]) -> str:
    return " ".join(w if w[0].isupper() else w.capitalize() for w in words)


def _make_entities(seed: int, n_entities: int) -> pd.DataFrame:
    rng = np.random.default_rng((seed, 0))
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
        if name in seen_names:  # de-duplicate canonical names deterministically
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


def _payload(entities: pd.DataFrame) -> EntityPayload:
    n = len(entities)
    weights = np.ones(n)
    weights[: max(1, n * 3 // 100)] = 100.0  # hot entities
    weights /= weights.sum()
    types = entities["entity_type"].to_numpy()
    return EntityPayload(
        ids=entities["entity_id"].to_numpy(),
        names=entities["canonical_name"].to_numpy(),
        aliases=entities["aliases"].to_list(),
        weights=weights,
        tool_idx=np.flatnonzero(types == "tool"),
        place_idx=np.flatnonzero(types == "place"),
    )


def _sample(rng: np.random.Generator, ent: EntityPayload, kind: str | None) -> int:
    if kind == "tool" and len(ent.tool_idx):
        return int(rng.choice(ent.tool_idx))
    if kind == "place" and len(ent.place_idx):
        return int(rng.choice(ent.place_idx))
    return int(rng.choice(len(ent.ids), p=ent.weights))


def _surface(rng: np.random.Generator, ent: EntityPayload, idx: int, perturb_rate: float) -> str:
    forms = [ent.names[idx]] + list(ent.aliases[idx])
    w = np.array([4.0] + [1.0] * len(ent.aliases[idx]))  # favour canonical
    s = str(forms[int(rng.choice(len(forms), p=w / w.sum()))])
    if rng.random() < perturb_rate and len(s) > 6:
        p = int(rng.integers(1, len(s) - 1))  # unseen surface: drop one char
        s = s[:p] + s[p + 1 :]
    return s


def _gen_conversation(
    c: int,
    n_conversations: int,
    seed: int,
    ent: EntityPayload,
    perturb_rate: float,
) -> tuple[list[tuple], list[tuple]]:
    """→ (turn rows, truth triples) for conversation ``c`` — pure function
    of (seed, c); the distributed and driver paths both call this."""
    rng = np.random.default_rng((seed, 1, c))
    conv_id = f"conv_{c:06d}"
    n_hot = max(1, n_conversations * 5 // 100)
    if c < n_hot:  # hot conversations: 10–50× the ~12-turn median
        n_turns = int(rng.integers(120, 600))
    else:
        n_turns = int(rng.integers(4, 24))
    ts = _BASE_TS + timedelta(minutes=int(rng.integers(0, 300_000)))
    rows: list[tuple] = []
    truth: list[tuple] = []
    for t in range(n_turns):
        role = _ROLES[t % 2]
        tool = ""
        kind = rng.random()
        if kind < 0.35:
            text = str(rng.choice(_FILLER))
        elif kind < 0.50:
            i = _sample(rng, ent, None)
            text = f"Tell me about {_surface(rng, ent, i, perturb_rate)}."
        else:
            pred = PREDICATES[int(rng.integers(0, len(PREDICATES)))]
            if pred == "uses_tool":
                si, oi = _sample(rng, ent, None), _sample(rng, ent, "tool")
                role, tool = "tool", str(rng.choice(_TOOLS))
            elif pred == "located_in":
                si, oi = _sample(rng, ent, None), _sample(rng, ent, "place")
            else:
                si, oi = _sample(rng, ent, None), _sample(rng, ent, None)
            while oi == si:  # KG has no self-loops; keep truth consistent
                oi = _sample(
                    rng,
                    ent,
                    "tool" if pred == "uses_tool" else "place" if pred == "located_in" else None,
                )
            s_surf = _surface(rng, ent, si, perturb_rate)
            o_surf = _surface(rng, ent, oi, perturb_rate)
            phrase = PRED_PHRASE[pred]
            lead = str(rng.choice(["", "Note that ", "I found that ", "Records show "]))
            text = f"{lead}{s_surf} {phrase} {o_surf}."
            truth.append((conv_id, t, str(ent.ids[si]), pred, str(ent.ids[oi])))
        ts = ts + timedelta(seconds=int(rng.integers(5, 120)))
        rows.append((conv_id, np.int32(t), role, text, tool, ts))
    return rows, truth


def generate(
    seed: int = 42,
    n_conversations: int = 200,
    n_entities: int = 500,
    perturb_rate: float = 0.04,
) -> Fixture:
    """Driver-side generation with ground truth (tests / oracle parity)."""
    entities = _make_entities(seed, n_entities)
    ent = _payload(entities)
    t_rows: list[tuple] = []
    truth: list[tuple] = []
    for c in range(n_conversations):
        rows, tr = _gen_conversation(c, n_conversations, seed, ent, perturb_rate)
        t_rows.extend(rows)
        truth.extend(tr)
    transcripts = pd.DataFrame(t_rows, columns=TRANSCRIPT_COLUMNS)
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    truth_df = pd.DataFrame(
        truth, columns=["conv_id", "turn_idx", "subj_entity_id", "pred", "obj_entity_id"]
    )
    return Fixture(transcripts=transcripts, entities=entities, truth_triples=truth_df)


def transcript_schema():
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    return StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )


def generate_spark(
    spark,
    seed: int = 42,
    n_conversations: int = 20_000,
    n_entities: int = 500,
    perturb_rate: float = 0.04,
    partitions: int | None = None,
):
    """Executor-distributed generation (bench scale): conversations fan out
    over ``spark.range``; per-conversation RNG streams make the output
    byte-identical to ``generate`` at any parallelism.

    → (transcripts DataFrame, entities pandas DataFrame)
    """
    from collections.abc import Iterator

    entities = _make_entities(seed, n_entities)
    bc = spark.sparkContext.broadcast(_payload(entities))
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ent = bc.value
        for pdf in batches:
            rows: list[tuple] = []
            for c in pdf["id"]:
                r, _ = _gen_conversation(int(c), n_conversations, seed, ent, perturb_rate)
                rows.extend(r)
            out = pd.DataFrame(rows, columns=TRANSCRIPT_COLUMNS)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    tdf = (
        spark.range(0, n_conversations, numPartitions=parts)
        .mapInPandas(gen, schema=transcript_schema())
    )
    return tdf, entities


def to_spark(spark, fixture: Fixture):
    """Materialize fixture frames as Spark DataFrames with explicit schemas."""
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
        TimestampType,
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
    tdf = spark.createDataFrame(fixture.transcripts, schema=transcript_schema())
    edf = spark.createDataFrame(fixture.entities, schema=e_schema)
    return tdf, edf
