"""Group-by-document rollup — the reference's retrieval postprocessor
(/root/reference/src/model.py:13-32): group retrieved chunks by parent
document id, score = max(chunk scores) (model.py:28), text = concat of
chunk texts in a DETERMINISTIC order with the reference's separator
(model.py:27) — re-expressed as pure built-ins (no applyInPandas; the
grouped-map UDF would do the same work outside codegen).

The reference relies on retrieval order for the concat; Spark partition
order is nondeterministic, so the order key is explicit
(``order_cols``) — SURVEY §7 hard-part #1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.functions.text import GROUP_CONCAT_SEP


def group_rollup(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    text_col: str,
    order_cols: list[str],
    sep: str = GROUP_CONCAT_SEP,
) -> DataFrame:
    """→ one row per group: max score + order-stable concatenated text.

    `array_sort(collect_list(struct(order, text)))` gives a deterministic
    concat under any physical row order; map-side partial aggregation
    still applies (collect_list merges are associative).
    """
    order_struct = F.struct(*[F.col(c) for c in order_cols], F.col(text_col).alias("__t"))
    return df.groupBy(*group_cols).agg(
        F.max(score_col).alias("score"),
        F.concat_ws(
            sep, F.transform(F.array_sort(F.collect_list(order_struct)), lambda s: s["__t"])
        ).alias("text"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
    )


def group_rollup_pandas(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    text_col: str,
    order_cols: list[str],
    sep: str = GROUP_CONCAT_SEP,
) -> DataFrame:
    """Grouped-map ``applyInPandas`` twin of :func:`group_rollup` (the D4
    shape the reference's postprocessor would naively take,
    /root/reference/src/model.py:13-32).

    Kept for API parity and as the extension point for rollups whose merge
    logic outgrows built-ins; for the plain max+concat case PREFER
    :func:`group_rollup` — built-ins keep map-side partial aggregation,
    while a grouped-map UDF shuffles every row of every group to one task.
    """
    import pandas as pd

    out_group_cols = list(group_cols)

    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        ordered = pdf.sort_values(order_cols, kind="mergesort")
        head = {c: [pdf[c].iloc[0]] for c in out_group_cols}
        head["score"] = [pdf[score_col].max()]
        head["text"] = [sep.join(ordered[text_col].astype(str))]
        head["n_chunks"] = [len(pdf)]
        return pd.DataFrame(head)

    group_ddl = ", ".join(
        f"{c} {dict(df.dtypes)[c]}" for c in out_group_cols
    )
    score_type = dict(df.dtypes)[score_col]
    return df.groupBy(*group_cols).applyInPandas(
        roll, schema=f"{group_ddl}, score {score_type}, text string, n_chunks long"
    )
