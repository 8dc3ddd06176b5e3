"""Transcript-level analytics over the (conv_id, turn_idx, role, text,
tool, ts) table — the operational statistics an agent-transcript pipeline
runs alongside KG construction (tool-usage mining, latency profiling,
role balance). Reference-semantics anchor: the per-resource metadata
rollups of /root/reference/src/cdrc_logs.py:12-35, re-aimed at turns.

Scale shape shared by all three operators: ONE shuffle on ``conv_id``
(the same stable (conv_id, turn_idx) window ordering the assembly
operator pins — operators/assembly.py), then a map-side-combinable
aggregation whose key space is tiny (tool names, roles) or
conversation-sized. No UDFs; all Catalyst. Hot conversations land one
window partition each — a 600-turn conversation is microseconds of lag
work, so conv-level skew is a non-issue here (contrast extraction, where
salted_repartition exists for per-row heavy work).

Outputs are integer-exact (counts, integer-second gap sums/maxes) so the
DuckDB/VALUES oracle hashes match bit-for-bit — no float summation-order
hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tool_transition_counts(turns: DataFrame) -> DataFrame:
    """(prev_tool, tool, n) — corpus-wide counts of consecutive tool
    invocations within a conversation (non-tool turns between two tool
    calls are skipped: the sequence is the conversation's tool CALL
    sequence, not its turn sequence). First tool call of a conversation
    pairs with prev_tool = '<start>'.

    Plan: filter to tool turns (pushed to the scan), lag window over
    (conv_id, turn_idx), then a groupBy whose key space is
    |tools|² + |tools| — broadcast-small regardless of corpus size; the
    count is map-side combined so the second exchange carries one row
    per (prev_tool, tool) per task.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = (
        turns.filter(F.col("tool") != "")
        .select("conv_id", "turn_idx", "tool")
        .withColumn("prev_tool", F.lag("tool").over(w))
    )
    return (
        seq.select(
            F.coalesce("prev_tool", F.lit("<start>")).alias("prev_tool"), "tool"
        )
        .groupBy("prev_tool", "tool")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def turn_latency_stats(turns: DataFrame) -> DataFrame:
    """(role, n_gaps, sum_gap_s, max_gap_s) — per responding role, the
    integer-second gap between a turn and the PREVIOUS turn of its
    conversation (any role; the first turn of a conversation has no gap
    and is excluded). The gap is the difference of per-timestamp second
    FLOORS (unix_timestamp semantics) — on sub-second timestamps that
    differs from flooring the float difference (09.7→10.2 is 1, not 0),
    and the VALUES twin mirrors exactly this. sum/max instead of avg:
    integer-exact, so the
    result is independent of aggregation order (avg = sum/n is one IEEE
    division away for any consumer that wants it).

    Plan: one conv_id window (lag over ts), then a 2-3 row groupBy with
    map-side partials — the output is O(|roles|) however many turns
    flow in.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        turns.select("conv_id", "turn_idx", "role", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "role",
            (
                F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
            ).alias("gap_s"),
        )
    )
    return gaps.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_s").alias("sum_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


def role_balance(turns: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_user, n_assistant, n_tool) — per-conversation
    role mix, the first-line health metric of a transcript corpus
    (conversations with zero assistant turns, tool-only bursts, etc.).

    Plan: single groupBy(conv_id) with conditional counts — one exchange
    on the table's natural key, fully map-side combined; output is one
    row per conversation (the 10¹²-turn table collapses ~100× before
    the shuffle at typical turns/conversation).
    """
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count_if(F.col("role") == "user").alias("n_user"),
        F.count_if(F.col("role") == "assistant").alias("n_assistant"),
        F.count_if(F.col("role") == "tool").alias("n_tool"),
    )


def qa_pair_mining(turns: DataFrame) -> DataFrame:
    """(conv_id, q_turn_idx, a_turn_idx, q_len, a_len) — user turns that
    ask a question ('?' anywhere in the text) answered by the
    IMMEDIATELY following assistant turn. The question/answer pair miner
    every instruction-tuning data pipeline runs over agent transcripts;
    lengths are character counts (integer-exact hash core).

    Plan: one lead window over the stable (conv_id, turn_idx) order
    carrying (role, text, turn_idx) of the next turn, then a filter —
    no join, no second shuffle. Per-conversation window partitions keep
    hot conversations one-task local (same skew note as the module doc).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt = (
        turns.select("conv_id", "turn_idx", "role", "text")
        .withColumn("next_role", F.lead("role").over(w))
        .withColumn("next_text", F.lead("text").over(w))
        .withColumn("next_idx", F.lead("turn_idx").over(w))
    )
    return nxt.filter(
        (F.col("role") == "user")
        & F.col("text").contains("?")
        & (F.col("next_role") == "assistant")
    ).select(
        "conv_id",
        F.col("turn_idx").alias("q_turn_idx"),
        F.col("next_idx").alias("a_turn_idx"),
        F.length("text").cast("long").alias("q_len"),
        F.length("next_text").cast("long").alias("a_len"),
    )


def tool_retry_runs(turns: DataFrame, min_run: int = 2) -> DataFrame:
    """(conv_id, tool, start_turn_idx, run_len) — maximal runs of
    CONSECUTIVE calls to the same tool within a conversation's tool-call
    sequence (non-tool turns between calls are skipped, matching
    tool_transition_counts' sequence definition), kept when run_len ≥
    ``min_run``. Repeated immediate re-invocation is the retry/failure
    signature operations watches for in agent transcripts.

    Plan: filter to tool turns (pushed to the scan), one conv_id window
    computing the run-boundary flag (lag) and the running boundary sum
    (run id) — two window functions over ONE partitioning, so one
    shuffle — then a groupBy on (conv_id, run id), conversation-sized
    key space, map-side combined.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = (
        turns.filter(F.col("tool") != "")
        .select("conv_id", "turn_idx", "tool")
        .withColumn(
            "boundary",
            F.when(
                F.lag("tool").over(w).isNull()
                | (F.lag("tool").over(w) != F.col("tool")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "run_id",
            F.sum("boundary").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        seq.groupBy("conv_id", "run_id")
        .agg(
            F.first("tool").alias("tool"),
            F.min("turn_idx").alias("start_turn_idx"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_run)
        .select("conv_id", "tool", "start_turn_idx", "run_len")
    )


def topic_segments(
    turns_with_vec: DataFrame, vec_col: str = "vec", threshold: float = 0.15
) -> DataFrame:
    """(conv_id, turn_idx, segment_id) — segment each conversation at
    embedding-drift boundaries: a new segment starts where the cosine
    between a turn's vector and the PREVIOUS turn's vector falls below
    ``threshold`` (TextTiling's boundary rule on modern embeddings —
    the conversation-chunking stage a long-transcript KG/RAG pipeline
    runs before assembly). segment_id is the per-conversation running
    boundary count, starting at 1; output is integer-only, so the hash
    core carries no float.

    Plan: one conv_id window — lag(vec) + the fold-cosine Catalyst
    expression (functions/vector.cosine: double left-fold, the exact
    cross-engine order) + running boundary sum. One shuffle, no UDF, no
    join; the vectors themselves never leave the row.

    Threshold note: pick τ away from observed cosine mass (the fixture
    pins 0.15, whose nearest pair sits 3e-4 away); the fold is
    deterministic, so the decision is stable — the margin only guards
    against callers swapping in a different (but close) kernel.
    """
    from cdrc_semantic_search_spark.functions.vector import cosine

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag(vec_col).over(w)
    boundary = F.when(
        prev.isNull() | (cosine(prev, F.col(vec_col)) < threshold), 1
    ).otherwise(0)
    return (
        turns_with_vec.select("conv_id", "turn_idx", F.col(vec_col))
        .withColumn("_boundary", boundary)
        .withColumn(
            "segment_id",
            F.sum("_boundary")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .select("conv_id", "turn_idx", "segment_id")
    )


def salient_turns(
    turns_with_vec: DataFrame, vec_col: str = "vec", top_k: int = 1
) -> DataFrame:
    """(conv_id, turn_idx, rank) — the ``top_k`` most central turns of
    each conversation: highest fold-cosine to the conversation's exact
    embedding centroid (ties broken by earliest turn). The extractive
    salience selector a summarization/labeling pipeline runs to pick
    representative turns before an expensive LLM pass.

    Exactness: the centroid comes from :func:`~cdrc_semantic_search_spark.
    operators.rollup.label_centroids` — DECIMAL(38,18) element sums, so
    it is accumulation-order- and partitioning-independent; the score is
    the deterministic double left fold (functions/vector.cosine).
    Identical turn texts tie at identical doubles and the window's
    (score DESC, turn_idx ASC) order resolves them reproducibly.

    100-TB shape: centroids collapse to one row per conversation before
    the join back (both sides shuffle on conv_id — the join and the
    rank window reuse that partitioning); output is k rows per
    conversation. posexplode inside label_centroids multiplies rows by
    dim pre-aggregation — map-side combine eats it before the exchange.
    """
    from cdrc_semantic_search_spark.operators.rollup import label_centroids

    cents = label_centroids(
        turns_with_vec.select(F.col("conv_id"), F.col(vec_col)),
        "conv_id",
        vec_col,
        round_digits=6,
    ).select(F.col("label").alias("conv_id"), "centroid")
    from cdrc_semantic_search_spark.functions.vector import cosine

    scored = turns_with_vec.select("conv_id", "turn_idx", F.col(vec_col)).join(
        cents, "conv_id"
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.col("_score").desc(), F.col("turn_idx").asc()
    )
    return (
        scored.withColumn("_score", cosine(F.col(vec_col), F.col("centroid")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("conv_id", "turn_idx", "rank")
    )


def qa_lexical_overlap(turns: DataFrame) -> DataFrame:
    """(conv_id, q_turn_idx, a_turn_idx, n_common, n_union, jaccard) —
    token-set Jaccard between each mined question and its answer: the
    cheap answer-relevance proxy an instruction-tuning pipeline uses to
    drop non-sequitur pairs before the expensive judge.

    Tokenization is the shared Catalyst ``tokens`` kernel (split on
    [^a-z0-9]+, lowercased — functions/text.tokens, twin-pinned), sets
    via array_distinct; Jaccard is one int/int IEEE division (n_union 0
    → 0.0 explicitly). Same single-window plan as
    :func:`qa_pair_mining` — no join, one conv_id shuffle.
    """
    from cdrc_semantic_search_spark.functions.text import tokens

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt = (
        turns.select("conv_id", "turn_idx", "role", "text")
        .withColumn("next_role", F.lead("role").over(w))
        .withColumn("next_text", F.lead("text").over(w))
        .withColumn("next_idx", F.lead("turn_idx").over(w))
    )
    qa = nxt.filter(
        (F.col("role") == "user")
        & F.col("text").contains("?")
        & (F.col("next_role") == "assistant")
    ).select(
        "conv_id",
        F.col("turn_idx").alias("q_turn_idx"),
        F.col("next_idx").alias("a_turn_idx"),
        F.array_distinct(tokens(F.col("text"))).alias("tq"),
        F.array_distinct(tokens(F.col("next_text"))).alias("ta"),
    )
    return qa.select(
        "conv_id",
        "q_turn_idx",
        "a_turn_idx",
        F.size(F.array_intersect("tq", "ta")).cast("long").alias("n_common"),
        F.size(F.array_union("tq", "ta")).cast("long").alias("n_union"),
        F.when(F.size(F.array_union("tq", "ta")) == 0, F.lit(0.0))
        .otherwise(
            F.size(F.array_intersect("tq", "ta")).cast("double")
            / F.size(F.array_union("tq", "ta")).cast("double")
        )
        .alias("jaccard"),
    )
