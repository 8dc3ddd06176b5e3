"""Registry of driver-checkable queries: every SURVEY §2 operator exercised
over the driver's parquet tables, each with (when SQL-expressible) a
DuckDB oracle producing identical column names and values.

Cross-engine determinism conventions (why results hash-match exactly):

* money/metric aggregates: ``SUM(CAST(x AS DECIMAL(18,4)))`` — exact
  decimal arithmetic is order-independent and engine-independent; the
  final cast to DOUBLE converts the same exact decimal on both sides.
  A plain double SUM differs between engines in the last bits because the
  addition order differs.
* float-chain outputs (cosines, ratios): ROUND(x, 6) — cross-engine drift
  is ~1e-15, six decimals is 9 orders of magnitude away from the boundary.
* every aggregate/computed column aliased identically in Spark and SQL;
  ties in any top-k/order broken by a unique key column.
* hashes that must match across engines use md5 (both engines agree);
  xxhash64 stays engine-internal only.

Round-7 registry maintenance (VERDICT r6 #5): the 6.9 kLoC single file
is split into plans/catalog/<chunk>.py at the original section
boundaries. Content moved verbatim; this module imports the chunks in
the ORIGINAL file order, so registration order — and therefore
``queries()`` / ``oracle_sql()`` iteration order and every SQL string —
is byte-identical to the unsplit file.
"""

from __future__ import annotations

# re-exports: the public surface predates the split
from cdrc_semantic_search_spark.plans.catalog._core import (  # noqa: F401
    QueryDef,
    REGISTRY,
    _dec_sum,
    load,
    register,
)

# chunk imports populate REGISTRY as a side effect — KEEP THIS ORDER
# (it is the unsplit file's section order)
from cdrc_semantic_search_spark.plans.catalog import relational  # noqa: E402,F401
from cdrc_semantic_search_spark.plans.catalog import vectors  # noqa: E402,F401
from cdrc_semantic_search_spark.plans.catalog import dedup  # noqa: E402,F401
from cdrc_semantic_search_spark.plans.catalog import textstats  # noqa: E402,F401
from cdrc_semantic_search_spark.plans.catalog import graph  # noqa: E402,F401
from cdrc_semantic_search_spark.plans.catalog import extended  # noqa: E402,F401
from cdrc_semantic_search_spark.plans.catalog import transcripts  # noqa: E402,F401
from cdrc_semantic_search_spark.plans.catalog import rules  # noqa: E402,F401
