"""Scalar text functions — Catalyst-native (JVM, codegen'd) re-expressions of
every string transform the reference performs imperatively (SURVEY §2.8).

Each helper returns a Column; nothing here is a Python UDF, so all of it
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# separator the reference uses when concatenating grouped chunk texts
# (/root/reference/src/model.py:27)
GROUP_CONCAT_SEP = "\n--------------------\n"


def strip_html(col: Column) -> Column:
    """HTML tag removal — reference ``re.sub('<[^<]+?>', '', notes)``
    (/root/reference/src/query_api.py:93)."""
    return F.regexp_replace(col, "<[^<]+?>", "")


def normalize_query(col: Column) -> Column:
    """Log-mining normalize chain (/root/reference/src/cdrc_logs.py:12-20,27-35):
    lower → url-decode space forms → drop sort_by suffix → collapse ws → trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, "%20", " ")
    c = F.regexp_replace(c, "\\+", " ")
    c = F.regexp_replace(c, "&sort_by.*$", "")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def url_basename(col: Column) -> Column:
    """``url.split('/')[-1]`` (/root/reference/src/query_api.py:79)."""
    return F.element_at(F.split(col, "/"), -1)


def doc_id_parts(col: Column) -> tuple[Column, Column]:
    """``doc_id.split('-', maxsplit=1)`` → (kind, main_id)
    (/root/reference/src/datastore.py:25)."""
    parts = F.split(col, "-", 2)
    return F.element_at(parts, 1), F.element_at(parts, 2)


def filename_template(kind: Column, id_: Column, fmt: Column) -> Column:
    """``f'{kind}-{id}.{fmt}'`` (/root/reference/src/query_api.py:108-112)."""
    return F.format_string("%s-%s.%s", kind, id_, F.lower(fmt))


def notes_document(title: Column, notes: Column) -> Column:
    """Synthesized notes doc body: title + blank line + HTML-stripped notes
    (/root/reference/src/query_api.py:90-94)."""
    return F.concat_ws("\n\n", title, strip_html(notes))


# the reference's composite-LLM-response segment separator
# (/root/reference/search_service/streamlit_app.py:37)
LLM_RESPONSE_SEP = "---------------------"


def parse_llm_response(seg: Column) -> tuple[Column, Column, Column]:
    """F11: parse one LLM response segment → (valid, summary, relevance).

    Mirror of the reference's
    ``r.split("Summary: ")[1].split("Relevance: ")``
    (/root/reference/search_service/streamlit_app.py:38-47): a segment is
    valid iff it contains both markers; summary is the text between them,
    relevance the tail. Invalid segments yield NULLs (the reference keeps a
    ``None`` placeholder to stay zip-aligned with metadata).
    """
    valid = seg.contains("Summary: ") & seg.contains("Relevance: ")
    after_summary = F.element_at(F.split(seg, "Summary: "), 2)
    # both pieces come from the text AFTER the summary marker, exactly like
    # the reference's chained .split — a 'Relevance: ' occurring BEFORE
    # 'Summary: ' must not win
    summary = F.element_at(F.split(after_summary, "Relevance: "), 1)
    relevance = F.element_at(F.split(after_summary, "Relevance: "), 2)
    null = F.lit(None).cast("string")
    return (
        valid,
        F.when(valid, summary).otherwise(null),
        F.when(valid, relevance).otherwise(null),
    )


def tokens(col: Column) -> Column:
    """Whitespace/punctuation tokenization → array<string> (lowercased)."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# BPE-ish pre-tokenization pattern (GPT-2-style, ASCII subset): common
# English contractions, letter runs, digit runs, punctuation runs. No
# lookarounds, so Java regex (Spark) and RE2 (DuckDB) agree exactly.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\s']+"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization → array<string> (lowercased).

    The training-data token counter: whitespace tokens undercount what a
    BPE vocabulary sees (punctuation and digit runs become separate
    tokens, contractions split). Pure Catalyst (regexp_extract_all)."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_TOKEN_PATTERN), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col))


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles as strings — basis for MinHash / Jaccard dedup.

    Pure Catalyst: transform over a sliced token array. Degenerate texts
    (< k tokens) shingle to their full token join; EMPTY texts produce zero
    shingles (not ['']), matching the pure-Python minhash twin — otherwise
    two empty documents would surface as Jaccard-1.0 near-duplicates.
    """
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    raw = F.when(
        n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.filter(raw, lambda s: s != F.lit(""))
