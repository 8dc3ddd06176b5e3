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
