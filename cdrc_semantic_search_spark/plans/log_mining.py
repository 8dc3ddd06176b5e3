"""Query-log mining — the reference's ``src/cdrc_logs.py`` re-expressed.

Raw web-server access logs → extracted search-query strings → normalize
chain → count-by-value sorted desc (S4/F1/F2/A2/W2; sink K6).  The
reference loads two whole log files into memory and regex-findalls them
(cdrc_logs.py:7-25); here logs are a line-per-row DataFrame and the
extraction is `regexp_extract_all` — JVM-side, distributable over any log
volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.functions.text import normalize_query

# the two URL query-parameter shapes mined by the reference
# (cdrc_logs.py:7-10,22-25): drupal `?q=...` / apache `search_api_fulltext=...`
DRUPAL_PATTERN = r"\?q=([^&\s\"]+)"
APACHE_PATTERN = r"search_api_fulltext=([^&\s\"]+)"


def extract_queries(logs: DataFrame, pattern: str, value_col: str = "value") -> DataFrame:
    """F1: regexp findall over log lines → one row per extracted query."""
    return logs.select(
        F.explode(F.regexp_extract_all(F.col(value_col), F.lit(pattern), F.lit(1))).alias(
            "raw_query"
        )
    )


def mine_query_counts(
    drupal_logs: DataFrame, apache_logs: DataFrame, value_col: str = "value"
) -> DataFrame:
    """Full pipeline: extract both sources (U2 union), normalize (F2),
    drop empties, count desc (A2/W2)."""
    queries = extract_queries(drupal_logs, DRUPAL_PATTERN, value_col).unionByName(
        extract_queries(apache_logs, APACHE_PATTERN, value_col)
    )
    return (
        queries.select(normalize_query(F.col("raw_query")).alias("query"))
        .filter(F.col("query") != "")
        .groupBy("query")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("query"))
    )
