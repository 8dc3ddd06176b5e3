"""Shared registry core for the catalog query chunks.

``REGISTRY`` / ``register`` / ``QueryDef`` and the helpers every chunk
uses. The chunks (relational, vectors, dedup, textstats, graph,
extended, transcripts, rules) register their queries as an import side
effect; plans/catalog_queries.py imports them in the original file
order so registration order — and therefore ``queries()`` /
``oracle_sql()`` iteration order — is unchanged by the round-7 split.
See plans/catalog_queries.py for the cross-engine determinism
conventions that make value hashes match exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    # DuckDB oracle; None → rows-only check. A CALLABLE defers the SQL to
    # first use — plans/value_oracles.py builds VALUES-literal oracles
    # from pure-Python twins for queries whose logic (seeded LSH, crc32
    # signatures, the KG fixture pipeline) is deterministic but not
    # directly SQL-expressible.
    sql: Optional[str] | Callable[[], str]

    def sql_text(self) -> Optional[str]:
        return self.sql() if callable(self.sql) else self.sql


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, sql: Optional[str]):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, sql)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _dec_sum(col, alias: str):
    """Exact, engine-independent sum of a double column (see the module
    doc in plans/catalog_queries.py)."""
    return F.sum(F.col(col).cast("decimal(18,4)")).cast("double").alias(alias)


#: Shared DuckDB-SQL fragments (tokenization + per-language stopword
#: literals) used by the textstats, extended and rules chunks — one
#: source of truth so Spark-side tokens() and the oracles stay aligned.
_SQL_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_SQL_SW_EN = "['the','and','of','to','a','in','is','it','that','for']"
_SQL_SW_FR = "['le','la','et','les','des','un','une','du','est','dans']"
_SQL_SW_DE = "['der','die','und','das','ein','ist','nicht','mit','den','von']"
_SQL_SW_ES = "['el','la','de','que','y','en','un','es','los','por']"
