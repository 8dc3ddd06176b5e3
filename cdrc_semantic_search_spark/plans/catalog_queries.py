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
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from cdrc_semantic_search_spark.functions import text as T
from cdrc_semantic_search_spark.functions import vector as V
from cdrc_semantic_search_spark.functions.scale import fan_out
from cdrc_semantic_search_spark.plans import value_oracles


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
    """Exact, engine-independent sum of a double column (see module doc)."""
    return F.sum(F.col(col).cast("decimal(18,4)")).cast("double").alias(alias)


# =====================================================================
# §2.3 projections / filters / predicates
# =====================================================================

@register(
    "p1_name_filter",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE lower(p_name) LIKE '%red%' OR lower(p_name) LIKE '%blue%'
    """,
)
def p1_name_filter(spark, sf_dir):
    """P1 resource-name filter (reference query_api.py:78: keep resources
    whose name contains 'profile'/'flyer', case-insensitive)."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.lower(F.col("p_name")).rlike("red|blue"))
        .select("p_partkey", "p_name", "p_type")
    )


@register(
    "p2_null_presence",
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE props IS NOT NULL AND event_type <> '' AND value IS NOT NULL
    """,
)
def p2_null_presence(spark, sf_dir):
    """P2/P3 presence predicates (query_api.py:75-76,113-115)."""
    e = load(spark, sf_dir, "events")
    return e.filter(
        F.col("props").isNotNull()
        & (F.col("event_type") != "")
        & F.col("value").isNotNull()
    ).select("event_id", "event_type", "value")


@register(
    "p6_json_flatten",
    """
    SELECT event_id, event_type,
           CAST(props->>'k' AS BIGINT) AS k_val
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def p6_json_flatten(spark, sf_dir):
    """P6 response flatten + F9 JSON decode (model.py:84-91, query_api.py:38)."""
    e = load(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@register(
    "p7_id_parse",
    """
    SELECT o_orderkey,
           split_part(o_orderpriority, '-', 1) AS prio_code,
           split_part(o_orderpriority, '-', 2) AS prio_name
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def p7_id_parse(spark, sf_dir):
    """P7/F7 doc_id split('-', maxsplit=1) (datastore.py:25)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    parts = F.split("o_orderpriority", "-", 2)
    return o.select(
        "o_orderkey",
        F.element_at(parts, 1).alias("prio_code"),
        F.element_at(parts, 2).alias("prio_name"),
    )


# =====================================================================
# §2.8 scalar functions
# =====================================================================

@register(
    "f2_normalize_chain",
    """
    SELECT p_partkey,
           trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(p_name), '%20', ' ', 'g'), '\\+', ' ', 'g'),
               '&sort_by.*$', '', 'g'), '\\s+', ' ', 'g')) AS norm_name
    FROM part WHERE p_partkey < 500
    """,
)
def f2_normalize_chain(spark, sf_dir):
    """F2 log-query normalize chain (cdrc_logs.py:12-35)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select("p_partkey", T.normalize_query(F.col("p_name")).alias("norm_name"))


@register(
    "f3_html_strip",
    """
    SELECT doc_id,
           regexp_replace('<b>' || text || '</b>', '<[^<]+?>', '', 'g') AS clean_text
    FROM documents WHERE doc_id < 50
    """,
)
def f3_html_strip(spark, sf_dir):
    """F3 HTML tag strip (query_api.py:93) — tags synthesized then removed."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    wrapped = F.concat(F.lit("<b>"), F.col("text"), F.lit("</b>"))
    return d.select("doc_id", T.strip_html(wrapped).alias("clean_text"))


@register(
    "f4_url_basename",
    """
    SELECT doc_id,
           split_part('http://host/' || source || '/' || doc_id || '.pdf', '/', -1) AS basename
    FROM documents WHERE doc_id < 100
    """,
)
def f4_url_basename(spark, sf_dir):
    """F4 url.split('/')[-1] (query_api.py:79) over a synthesized URL."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    url = F.concat(
        F.lit("http://host/"), F.col("source"), F.lit("/"), F.col("doc_id"), F.lit(".pdf")
    )
    return d.select("doc_id", T.url_basename(url).alias("basename"))


@register(
    "f5_filename_template",
    """
    SELECT doc_id,
           format('{}-{}.{}', 'profile', doc_id, lower(source)) AS filename
    FROM documents WHERE doc_id < 100
    """,
)
def f5_filename_template(spark, sf_dir):
    """F5 filename templating (query_api.py:108-112)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        T.filename_template(F.lit("profile"), F.col("doc_id"), F.col("source")).alias(
            "filename"
        ),
    )


@register(
    "f8_date_parts",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_iso
    FROM orders WHERE o_orderkey < 2000
    """,
)
def f8_date_parts(spark, sf_dir):
    """F8 date parse → ISO (datastore.py:33) + calendar parts."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_iso"),
    )


@register(
    "f10_contains",
    """
    SELECT doc_id, n_chars FROM documents
    WHERE text LIKE '%spark%' AND lang = 'en'
    """,
)
def f10_contains(spark, sf_dir):
    """F10 substring membership (query_api.py:78,109)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(F.col("text").contains("spark") & (F.col("lang") == "en")).select(
        "doc_id", "n_chars"
    )


@register(
    "f11_response_parse",
    """
    WITH seg AS (
        SELECT CAST(doc_id // 4 AS BIGINT) AS grp, doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'note ' || source
                    ELSE 'Title: doc ' || doc_id || chr(10) || 'Summary: ' ||
                         substr(text, 1, 40) || ' Relevance: ' || source END AS s
        FROM documents WHERE doc_id < 40
    ),
    comp AS (
        SELECT grp, string_agg(s, '---------------------' ORDER BY doc_id) AS c
        FROM seg GROUP BY grp
    ),
    ex AS (
        SELECT grp, unnest(string_split(c, '---------------------')) AS one
        FROM comp
    )
    SELECT grp,
           (one LIKE '%Summary: %' AND one LIKE '%Relevance: %') AS valid,
           CASE WHEN one LIKE '%Summary: %' AND one LIKE '%Relevance: %'
                THEN string_split(string_split(one, 'Summary: ')[2], 'Relevance: ')[1]
           END AS summary,
           CASE WHEN one LIKE '%Summary: %' AND one LIKE '%Relevance: %'
                THEN string_split(string_split(one, 'Summary: ')[2], 'Relevance: ')[2]
           END AS relevance
    FROM ex
    """,
)
def f11_response_parse(spark, sf_dir):
    """F11: composite LLM-response split + per-segment Summary/Relevance
    parse (/root/reference/search_service/streamlit_app.py:37-47). The
    composite is synthesized deterministically from documents (every third
    segment lacks the markers, exercising the reference's None
    placeholder), split on the 21-dash separator, and parsed Catalyst-only."""
    from cdrc_semantic_search_spark.functions.text import (
        LLM_RESPONSE_SEP,
        parse_llm_response,
    )

    d = load(spark, sf_dir, "documents").filter("doc_id < 40")
    seg = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit("note "), F.col("source"))
    ).otherwise(
        F.concat(
            F.lit("Title: doc "),
            F.col("doc_id").cast("string"),
            F.lit("\nSummary: "),
            F.substring("text", 1, 40),
            F.lit(" Relevance: "),
            F.col("source"),
        )
    )
    comp = (
        d.select((F.col("doc_id") / 4).cast("long").alias("grp"), "doc_id", seg.alias("s"))
        .groupBy("grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "s"))),
                    lambda x: x["s"],
                ),
                LLM_RESPONSE_SEP,
            ).alias("c")
        )
    )
    exploded = comp.select(
        "grp", F.explode(F.split("c", "\\-{21}")).alias("one")
    )
    valid, summary, relevance = parse_llm_response(F.col("one"))
    return exploded.select(
        "grp",
        valid.alias("valid"),
        summary.alias("summary"),
        relevance.alias("relevance"),
    )


# =====================================================================
# §2.4 joins
# =====================================================================

@register(
    "j1_broadcast_enrich",
    """
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j1_broadcast_enrich(spark, sf_dir):
    """J1/J2 metadata lookup joins (datastore.py:19-42) as broadcast hash
    equi-joins: fact=customer, dims=nation/region broadcast."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            _dec_sum("c_acctbal", "total_acctbal"),
        )
    )


@register(
    "j4_anti_resume",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def j4_anti_resume(spark, sf_dir):
    """J4 change-detection diff as an ANTI join (query_api.py:55-70; the
    resume anti-join of SURVEY §2.10)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


@register(
    "j6_semi_membership",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts_ordered
    FROM part p WHERE EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def j6_semi_membership(spark, sf_dir):
    """J6 set-membership semi-join (datastore.py:81, query_api.py:51-52)."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return (
        p.join(li, "p_partkey", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts_ordered"))
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey AS orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l.l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c, orders o, lineitem l
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate < DATE '1998-03-15' AND l.l_shipdate > DATE '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → two joins → agg → top-k.
    Customer is SF-proportional, so NO forced broadcast hint — AQE /
    autoBroadcastJoinThreshold picks broadcast when the filtered side is
    genuinely small and falls back to shuffle join at 100× (a forced
    hint would OOM the driver there). Lineitem never shuffles before the
    groupBy on its own key."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(15,4)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
                ),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
        .select("orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l.l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey
      AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: multi-join with same-nation constraint."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, (o["o_custkey"] == c["c_custkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(15,4)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
                ),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(vol), 4) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(l.l_shipdate) AS INTEGER) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l.l_discount AS DECIMAL(8,4)) AS vol
      FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2
      WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
        AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey
        AND c.c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional two-nation trade volume by year —
    the disjunctive nation-pair predicate over a double broadcast of the
    nation dim (n1 supplier-side, n2 customer-side)."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(15,4)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
                ),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN vol
                               ELSE CAST(0 AS DECIMAL(24,8)) END), 4) AS DOUBLE)
           / CAST(ROUND(SUM(vol), 4) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l.l_discount AS DECIMAL(8,4)) AS vol,
             n2.n_name AS nation
      FROM part p, supplier s, lineitem l, orders o, customer c, nation n1, nation n2, region r
      WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r.r_regionkey
        AND r.r_name = 'EUROPE' AND s.s_nationkey = n2.n_nationkey
        AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1998-01-01'
        AND p.p_type = 'PROMO'
    ) GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part volume
    per year — conditional aggregation as a ratio of two decimal-exact
    sums, each rounded before the final double division (the only
    cross-engine-exact way to divide floats; NOTES.md conventions)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice").cast("decimal(15,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,4)")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("decimal(24,8)")
                    )
                ),
                4,
            )
            .cast("double")
            .alias("__num"),
            F.round(F.sum(vol), 4).cast("double").alias("__den"),
        )
        .select(
            "o_year", (F.col("__num") / F.col("__den")).alias("mkt_share")
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l.l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name AS nation_name
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-04-01'
      AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter.  The LIMIT rides a DETERMINISTIC order (revenue desc,
    custkey asc) so both engines cut the same 20 rows even on revenue
    ties."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(15,4)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
                ),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation_name")
    )


# =====================================================================
# §2.5 aggregations
# =====================================================================

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1: the canonical wide aggregation; map-side partial agg +
    2-column group key. A1/A5 analog at scale."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-09-02")
    # factor-wise decimal cast BEFORE multiplying: exact decimal products are
    # engine-independent, while casting a double product rounds half-up in
    # Spark vs half-even in DuckDB and drifts over thousands of rows
    price_d = F.col("l_extendedprice").cast("decimal(15,4)")
    disc_d = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    tax_d = (F.lit(1) + F.col("l_tax")).cast("decimal(8,4)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", "sum_qty"),
            _dec_sum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(price_d * disc_d), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(price_d * disc_d * tax_d), 4)
            .cast("double")
            .alias("sum_charge"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_qty"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-aggregate; predicate pushdown showcase."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(15,4)")
                    * F.col("l_discount").cast("decimal(8,4)")
                ),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "a1_group_rollup",
    """
    SELECT source,
           CAST(MAX(n_chars) AS BIGINT) AS score,
           string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id) AS text,
           CAST(COUNT(*) AS BIGINT) AS n_chunks
    FROM documents
    GROUP BY source
    """,
)
def a1_group_rollup(spark, sf_dir):
    """A1 group-by-document rollup (model.py:13-32): max score + ordered
    concat — the reference's retrieval postprocessor over driver tables."""
    from cdrc_semantic_search_spark.operators.rollup import group_rollup

    d = load(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").alias("score"),
        "doc_id",
        F.col("doc_id").cast("string").alias("doc_id_str"),
    )
    out = group_rollup(d, ["source"], "score", "doc_id_str", ["doc_id"], sep="|")
    return out.select(
        "source", F.col("score").cast("long").alias("score"), "text", "n_chunks"
    )


@register(
    "a2_count_by_value",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, event_type ASC
    """,
)
def a2_count_by_value(spark, sf_dir):
    """A2 Counter + sort desc (cdrc_logs.py:38-44) + W2 global sort."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
    )


@register(
    "a3_distinct_sets",
    """
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_with_orders,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders
    """,
)
def a3_distinct_sets(spark, sf_dir):
    """A3 distinct id sets (query_api.py:51-52)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").cast("long").alias("n_customers_with_orders"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_priorities"),
    )


@register(
    "a5_minmax_by_group",
    """
    SELECT c_nationkey,
           CAST(MIN(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS min_bal,
           CAST(MAX(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS max_bal,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def a5_minmax_by_group(spark, sf_dir):
    """A5 max-over-group (model.py:28) + min/avg."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.min(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("min_bal"),
        F.max(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("max_bal"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_bal"),
    )


# =====================================================================
# §2.6 windows / top-k / limits
# =====================================================================

@register(
    "w1_topk_per_group",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        FROM orders WHERE o_custkey < 100
    ) WHERE rk <= 3
    """,
)
def w1_topk_per_group(spark, sf_dir):
    """W1 top-k per group (model.py:77 similarity_top_k analog)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rk"
        )
    )


@register(
    "w3_limit_offset",
    """
    SELECT p_partkey, p_retailprice, rk FROM (
        SELECT p_partkey, p_retailprice,
               CAST(ROW_NUMBER() OVER (ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rk
        FROM part
    ) WHERE rk BETWEEN 2 AND 9
    """,
)
def w3_limit_offset(spark, sf_dir):
    """W3 head(9)[1:] — limit+offset via row_number (demos/demo.py:7)."""
    p = load(spark, sf_dir, "part")
    w = Window.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") >= 2) & (F.col("rk") <= 9))
        .select("p_partkey", "p_retailprice", "rk")
    )


@register(
    "w5_lag_lead_context",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN delta > 0 THEN CAST(delta AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS sum_pos_delta
    FROM (
        SELECT user_id, value - LAG(value) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS delta
        FROM events
    ) GROUP BY user_id
    """,
)
def w5_lag_lead_context(spark, sf_dir):
    """W5 stable intra-stream order + lag context (the dialogue-context
    window of SURVEY §2.6 over the events table)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    return (
        e.withColumn("delta", delta)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.when(F.col("delta") > 0, F.col("delta").cast("decimal(18,4)")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            )
            .cast("double")
            .alias("sum_pos_delta"),
        )
    )


@register(
    "w6_running_sum",
    """
    SELECT c_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM (SELECT o_custkey AS c_custkey, o_custkey, o_orderkey, o_orderdate, o_totalprice
          FROM orders WHERE o_custkey < 50)
    """,
)
def w6_running_sum(spark, sf_dir):
    """Frame-spec window: running per-customer spend."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# =====================================================================
# §2.7 set operations
# =====================================================================

@register(
    "u1_union_distinct",
    """
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_sources FROM (
        SELECT DISTINCT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT DISTINCT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    ) GROUP BY nationkey
    """,
)
def u1_union_distinct(spark, sf_dir):
    """U1/U2 unionByName of derived frames (evaluation.py:46-59)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct().withColumn("side", F.lit("customer"))
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct().withColumn("side", F.lit("supplier"))
    return (
        c.unionByName(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sources"))
    )


@register(
    "u2_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def u2_except(spark, sf_dir):
    """exceptAll/anti for resume sets (SURVEY §2.7)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.distinct().subtract(s)  # EXCEPT (set) semantics


@register(
    "u3_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def u3_intersect(spark, sf_dir):
    """INTERSECT (set) — the remaining §2.7 set operator: nations with
    BOTH customers and suppliers. Spark plans it as a distinct left-semi
    join, same shuffle shape as except."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


# =====================================================================
# §2.9 vector / semantic core
# =====================================================================

@register(
    "v3_cosine_neighbors",
    """
    SELECT a.vec_id, ROUND(
        list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
        (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
         sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos_next
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id < 200
    """,
)
def v3_cosine_neighbors(spark, sf_dir):
    """V3 cosine similarity (datastore.py:85,93) as a Catalyst expression —
    zip_with/aggregate fold, identical evaluation order to DuckDB's
    list_dot_product on DOUBLE[]."""
    e = load(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id"), F.col("embedding").alias("va")).filter("vec_id < 200")
    b = e.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("vb"))
    return (
        a.join(b, "vec_id")
        .select("vec_id", F.round(V.cosine(F.col("va"), F.col("vb")), 6).alias("cos_next"))
    )


@register(
    "j3_topk_cosine",
    """
    SELECT q_id, c_id, score, rank FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS c_id,
               ROUND(
                   list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                   (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                    sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id ORDER BY
                   list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                   (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                    sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) DESC,
                   b.vec_id ASC) AS INT) AS rank
        FROM embeddings a CROSS JOIN embeddings b
        WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id
    ) WHERE rank <= 5
    """,
)
def j3_topk_cosine(spark, sf_dir):
    """J3 the core top-k similarity join (model.py:73-79): exact cosine
    top-5 for 10 query vectors; tie-break (score desc, c_id asc)."""
    from cdrc_semantic_search_spark.operators.similarity import topk_cosine_exact

    e = load(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 10").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    out = topk_cosine_exact(q, c, k=6)  # k+1 then drop self-match
    out = (
        out.filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
            ),
        )
        .filter(F.col("rank") <= 5)
    )
    return out.select("q_id", "c_id", F.round("score", 6).alias("score"), "rank")


@register(
    "v4_hybrid_blend",
    """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(0.75 * (
               list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))))
           + 0.25 * (
               CAST(len(list_intersect(
                   list_distinct(list_filter(string_split_regex(lower(a.text), '[^a-z0-9]+'), x -> x <> '')),
                   list_distinct(list_filter(string_split_regex(lower(b.text), '[^a-z0-9]+'), x -> x <> ''))
               )) AS DOUBLE) /
               len(list_distinct(list_concat(
                   list_distinct(list_filter(string_split_regex(lower(a.text), '[^a-z0-9]+'), x -> x <> '')),
                   list_distinct(list_filter(string_split_regex(lower(b.text), '[^a-z0-9]+'), x -> x <> ''))
               )))), 6) AS hybrid_score
    FROM documents a
    JOIN documents b ON b.doc_id = a.doc_id + 1
    JOIN embeddings ea ON ea.vec_id = a.doc_id
    JOIN embeddings eb ON eb.vec_id = b.doc_id
    WHERE a.doc_id < 100
    """,
)
def v4_hybrid_blend(spark, sf_dir):
    """V4 hybrid α·dense + (1−α)·sparse blend, α=0.75 (config.toml:14-15,
    model.py:74-78): dense = embedding cosine, sparse = token Jaccard."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    a = d.filter("doc_id < 100").select(
        F.col("doc_id").alias("doc_a"), F.array_distinct(T.tokens(F.col("text"))).alias("ta")
    )
    b = d.select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.array_distinct(T.tokens(F.col("text"))).alias("tb"),
    )
    ea = e.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("va"))
    eb = e.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("vb"))
    joined = a.join(b, "doc_a").join(ea, "doc_a").join(eb, "doc_b")
    jac = F.size(F.array_intersect("ta", "tb")).cast("double") / F.size(
        F.array_union("ta", "tb")
    )
    return joined.select(
        "doc_a",
        "doc_b",
        F.round(
            F.lit(0.75) * V.cosine(F.col("va"), F.col("vb")) + F.lit(0.25) * jac, 6
        ).alias("hybrid_score"),
    )


@register(
    "knn_label_vote",
    """
    WITH scored AS (
        SELECT a.vec_id AS q_id, b.label, b.vec_id AS c_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                   list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                   (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                    sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) DESC,
                   b.vec_id ASC) AS rank
        FROM embeddings a CROSS JOIN embeddings b
        WHERE a.vec_id < 20 AND b.vec_id <> a.vec_id
    ),
    votes AS (
        SELECT q_id, label, COUNT(*) AS n FROM scored WHERE rank <= 5
        GROUP BY q_id, label
    ),
    ranked AS (
        SELECT q_id, label,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY n DESC, label ASC) AS lr
        FROM votes
    )
    SELECT q_id, CAST(label AS INT) AS knn_label FROM ranked WHERE lr = 1
    """,
)
def knn_label_vote(spark, sf_dir):
    """kNN majority-vote classification over the embedding corpus (the
    eval-style use of the retrieval core, SURVEY §2.9 V5 applied)."""
    from cdrc_semantic_search_spark.operators.similarity import topk_cosine_exact

    e = load(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 20").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"), "label")
    hits = (
        topk_cosine_exact(q, c.select("c_id", "c_vec"), k=6)
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "rank2",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
            ),
        )
        .filter(F.col("rank2") <= 5)
    )
    votes = (
        hits.join(c.select("c_id", "label"), "c_id")
        .groupBy("q_id", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("n"), F.asc("label"))
    return (
        votes.withColumn("lr", F.row_number().over(w))
        .filter(F.col("lr") == 1)
        .select("q_id", F.col("label").alias("knn_label"))
    )


@register(
    "v1_chunk_words",
    """
    SELECT doc_id, CAST(s AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, s * 12 + 1, s * 12 + 16), ' ') AS chunk_text
    FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM documents WHERE doc_id < 20
    ), LATERAL UNNEST(range(
        CASE WHEN len(toks) <= 16 THEN 1
             ELSE CAST(ceil((len(toks) - 4) / 12.0) AS BIGINT) END)) AS t(s)
    """,
)
def v1_chunk_words(spark, sf_dir):
    """V1 chunking (datastore.py:112-115): 16-token windows, 4 overlap,
    Catalyst-only — fully SQL-checkable."""
    from cdrc_semantic_search_spark.operators.chunker import chunk_words

    d = load(spark, sf_dir, "documents").filter("doc_id < 20")
    return chunk_words(d, "doc_id", "text", chunk_size=16, overlap=4)


# =====================================================================
# dedup family (training-data pipeline operators)
# =====================================================================

@register(
    "dedup_exact_groups",
    """
    SELECT dup_key, CAST(COUNT(*) AS BIGINT) AS n_docs,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids,
           MIN(doc_id) AS keeper
    FROM (
        SELECT doc_id, md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS dup_key FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS dup_key
        FROM documents WHERE doc_id < 50
    ) GROUP BY dup_key HAVING COUNT(*) > 1
    """,
)
def dedup_exact_groups(spark, sf_dir):
    """Exact dedup via digest groupBy; duplicates synthesized by unioning a
    shifted copy of the first 50 docs (corpus texts are all distinct).
    md5 digest so the oracle reproduces the key. ``doc_ids`` is emitted as a
    comma-joined string (sorted numerically first) — the driver's value-hash
    canonicalizer cannot factorize array-typed cells."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter("doc_id < 50").select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    uni = d.unionByName(dup)
    norm = F.trim(F.regexp_replace(F.col("text"), "\\s+", " "))
    return (
        uni.select("doc_id", F.md5(norm).alias("dup_key"))
        .groupBy("dup_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("doc_ids"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


@register(
    "dedup_token_jaccard",
    """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
    FROM (SELECT doc_id, list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS toks
          FROM documents WHERE doc_id < 60) a
    JOIN (SELECT doc_id, list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS toks
          FROM documents WHERE doc_id < 60) b
      ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
          len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5
    """,
)
def dedup_token_jaccard(spark, sf_dir):
    """Token-set (1-gram) Jaccard near-dup pairs ≥ 0.5 — the SQL-checkable
    member of the n-gram Jaccard family (k>1 variants below are
    rows-only)."""
    d = load(spark, sf_dir, "documents").filter("doc_id < 60")
    t = d.select(
        "doc_id", F.array_distinct(T.tokens(F.col("text"))).alias("toks")
    )
    a = t.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    jac = F.size(F.array_intersect("ta", "tb")).cast("double") / F.size(
        F.array_union("ta", "tb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= 0.5)
        .select("id_a", "id_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


@register(
    "dedup_ngram_jaccard",
    """
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(generate_series(1, len(toks) - 2),
                                            i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                        ELSE list_filter([array_to_string(toks, ' ')], x -> x <> '')
                   END
               ) AS sh
        FROM t
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS n_inter,
               CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS n_union
        FROM s a JOIN s b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, ROUND(n_inter / n_union, 6) AS jaccard
    FROM p WHERE n_union > 0 AND n_inter / n_union >= 0.2
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """3-gram shingle Jaccard pairs via the inverted-index self-join
    (operators/dedup.py). The candidate set is EXACT (any pair with
    Jaccard ≥ τ > 0 shares ≥ 1 shingle, so the inverted index misses
    nothing) and the xxhash64 shingle keys never leave the engine — the
    (id_a, id_b, jaccard) output hash-matches a small-n all-pairs DuckDB
    3-gram-Jaccard oracle."""
    from cdrc_semantic_search_spark.operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents").filter("doc_id < 200")
    return ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.2).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


@register("dedup_minhash_lsh", value_oracles.lazy("dedup_minhash_lsh"))
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH banded candidate pairs. Seeded → deterministic; the
    oracle is a VALUES literal from the pure-Python twin, which derives
    candidates by direct band-slice equality (value_oracles.py).
    Self-union of shifted docs guarantees true dupes."""
    from cdrc_semantic_search_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter("doc_id < 50").select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    uni = d.unionByName(dup)
    sigs = minhash_signatures(uni, "doc_id", "text", k=3, n_perm=64)
    return minhash_lsh_pairs(sigs, "doc_id", n_perm=64, n_bands=16, min_est_jaccard=0.9)


@register("dedup_minhash_lsh_capped", value_oracles.lazy("dedup_minhash_lsh_capped"))
def dedup_minhash_lsh_capped(spark, sf_dir):
    """The scale guard's output, oracle-pinned: a 30-copy mass-duplicate
    block (ids 20000..20029, all doc 0's text) makes every one of its
    band buckets 32 members — over the max_bucket_size=10 cap — so the
    guard skips them and doc 0 contributes no pairs, while clones 1..49
    still pair through their own 2-member buckets. The VALUES twin
    models the identical drop (value_oracles._minhash_lsh_twin cap=10),
    so capped output is value-hash-checked, not just row-counted."""
    from cdrc_semantic_search_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter("doc_id < 50").select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    mass = (
        spark.range(30)
        .select((F.col("id") + 20000).alias("doc_id"))
        .crossJoin(F.broadcast(d.filter("doc_id = 0").select("text")))
    )
    uni = d.unionByName(dup).unionByName(mass)
    sigs = minhash_signatures(uni, "doc_id", "text", k=3, n_perm=64)
    return minhash_lsh_pairs(
        sigs, "doc_id", n_perm=64, n_bands=16, min_est_jaccard=0.9,
        max_bucket_size=10,
    )


@register("dedup_simhash", value_oracles.lazy("dedup_simhash"))
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs; VALUES oracle from the pure-Python twin
    (chunk-equality blocking, exact hamming)."""
    from cdrc_semantic_search_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_signatures,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter("doc_id < 50").select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    sigs = simhash_signatures(d.unionByName(dup), "doc_id", "text")
    return simhash_near_pairs(sigs, "doc_id", max_hamming=3, n_bands=4)


@register(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS score
    FROM (SELECT * FROM embeddings WHERE vec_id < 500) a
    JOIN (SELECT * FROM embeddings WHERE vec_id < 500) b ON a.vec_id < b.vec_id
    WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
          (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
           sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.5
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs ≥ 0.5 — the deliberately-SMALL
    all-pairs oracle twin (vec_id < 500 keeps it quadratic-but-bounded at
    every SF); the scale path is the LSH-bucketed cosine_pairs_lsh
    (probabilistic candidate set → pytest-checked, not SQL-checked)."""
    e = load(spark, sf_dir, "embeddings").filter("vec_id < 500")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cos = V.cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("score_raw", cos)
        .filter(F.col("score_raw") >= 0.5)
        .select("id_a", "id_b", F.round("score_raw", 6).alias("score"))
    )


@register(
    "r1_bm25_scores",
    """
    WITH d AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM documents
    ),
    tk AS (SELECT doc_id, unnest(toks) AS term FROM d),
    doclen AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tk GROUP BY doc_id),
    stats AS (SELECT AVG(dl) AS avgdl FROM doclen),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tk WHERE term IN ('data', 'model', 'spark') GROUP BY doc_id, term
    ),
    idf AS (
        SELECT term,
               ln(((SELECT n FROM nn) - CAST(COUNT(DISTINCT doc_id) AS DOUBLE) + 0.5)
                  / (CAST(COUNT(DISTINCT doc_id) AS DOUBLE) + 0.5) + 1.0) AS idf
        FROM tf GROUP BY term
    ),
    part AS (
        SELECT tf.doc_id,
               idf.idf * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * doclen.dl / (SELECT avgdl FROM stats))) AS s
        FROM tf JOIN idf USING (term) JOIN doclen USING (doc_id)
    ),
    scored AS (SELECT doc_id, SUM(s) AS score FROM part GROUP BY doc_id)
    SELECT d2.doc_id AS id, ROUND(COALESCE(scored.score, 0.0), 6) AS score
    FROM documents d2 LEFT JOIN scored ON scored.doc_id = d2.doc_id
    """,
)
def r1_bm25_scores(spark, sf_dir):
    """BM25 lexical scoring of every document against a 3-term query
    (functions/ranking.bm25_scores) — the classic scorer behind the
    reference's sparse retrieval mode, as pure DataFrame algebra (one
    posting-table shuffle; idf/avgdl broadcast). Exact DuckDB oracle:
    tf/df/doclen are integers, avgdl is an exact-sum average, and ln
    drift is ~1 ulp — invisible at ROUND 6."""
    from cdrc_semantic_search_spark.functions.ranking import bm25_scores

    d = load(spark, sf_dir, "documents")
    out = bm25_scores(d, ["data", "model", "spark"], k1=1.2, b=0.75)
    return out.select("id", F.round("score", 6).alias("score"))


def _rrf_oracle_sql() -> str:
    """Two bm25 rankings (suffix-disambiguated CTE chains) fused by
    reciprocal rank: ranks on (ROUND(score,6) DESC, doc_id ASC) so ln's
    ~1-ulp drift cannot flip a rank, fused score = two exact divisions
    + one addition (bit-identical — no output rounding)."""

    def bm25_chain(terms: list[str], sfx: str) -> str:
        tl = ", ".join(f"'{t}'" for t in terms)
        return f"""
    d{sfx} AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM documents
    ),
    tk{sfx} AS (SELECT doc_id, unnest(toks) AS term FROM d{sfx}),
    doclen{sfx} AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tk{sfx} GROUP BY doc_id),
    stats{sfx} AS (SELECT AVG(dl) AS avgdl FROM doclen{sfx}),
    nn{sfx} AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    tf{sfx} AS (
        SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tk{sfx} WHERE term IN ({tl}) GROUP BY doc_id, term
    ),
    idf{sfx} AS (
        SELECT term,
               ln(((SELECT n FROM nn{sfx}) - CAST(COUNT(DISTINCT doc_id) AS DOUBLE) + 0.5)
                  / (CAST(COUNT(DISTINCT doc_id) AS DOUBLE) + 0.5) + 1.0) AS idf
        FROM tf{sfx} GROUP BY term
    ),
    part{sfx} AS (
        SELECT tf{sfx}.doc_id,
               idf{sfx}.idf * (tf{sfx}.tf * 2.2)
               / (tf{sfx}.tf + 1.2 * (1 - 0.75 + 0.75 * doclen{sfx}.dl / (SELECT avgdl FROM stats{sfx}))) AS s
        FROM tf{sfx} JOIN idf{sfx} USING (term) JOIN doclen{sfx} USING (doc_id)
    ),
    scored{sfx} AS (
        SELECT d2.doc_id AS id, ROUND(COALESCE(x.score, 0.0), 6) AS score
        FROM documents d2 LEFT JOIN (
            SELECT doc_id, SUM(s) AS score FROM part{sfx} GROUP BY doc_id
        ) x ON x.doc_id = d2.doc_id
    ),
    ranked{sfx} AS (
        SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS rank{sfx}
        FROM scored{sfx}
    ),
    top{sfx} AS (SELECT * FROM ranked{sfx} WHERE rank{sfx} <= 20)"""

    return (
        "WITH "
        + bm25_chain(["data", "model", "spark"], "_a").lstrip()
        + ","
        + bm25_chain(["data", "energy"], "_b")
        + """
    SELECT COALESCE(top_a.id, top_b.id) AS id,
           CAST(rank_a AS INTEGER) AS rank_a,
           CAST(rank_b AS INTEGER) AS rank_b,
           COALESCE(1.0 / (60 + CAST(rank_a AS DOUBLE)), 0.0)
           + COALESCE(1.0 / (60 + CAST(rank_b AS DOUBLE)), 0.0) AS rrf
    FROM top_a FULL OUTER JOIN top_b ON top_a.id = top_b.id
    """
    )


@register("r3_rrf_fusion", _rrf_oracle_sql)
def r3_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (functions/ranking.rrf_fuse, k=60, top 20)
    of two BM25 rankings over different query bags — the
    calibration-free hybrid-fusion baseline beside the reference's
    α-blend. Ranks are taken on 6-rounded scores so both engines rank
    identical values; the fused double needs no rounding."""
    from cdrc_semantic_search_spark.functions.ranking import (
        bm25_scores,
        rrf_fuse,
    )

    d = load(spark, sf_dir, "documents")
    a = bm25_scores(d, ["data", "model", "spark"]).select(
        "id", F.round("score", 6).alias("score")
    )
    b = bm25_scores(d, ["data", "energy"]).select(
        "id", F.round("score", 6).alias("score")
    )
    out = rrf_fuse(a, b, k=60, top=20)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("rank_a").cast("int").alias("rank_a"),
        F.col("rank_b").cast("int").alias("rank_b"),
        "rrf",
    )


@register(
    "r2_tfidf_scores",
    """
    WITH tk AS (
        SELECT doc_id AS id,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
        FROM documents
    ),
    tf AS (
        SELECT id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tk WHERE term IN ('data', 'model', 'spark', 'energy')
        GROUP BY id, term
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    idf AS (
        SELECT term,
               ln(((SELECT n FROM nn) + 1.0) / (CAST(COUNT(DISTINCT id) AS DOUBLE) + 1.0)) + 1.0 AS idf
        FROM tf GROUP BY term
    )
    SELECT tf.id, tf.term, ROUND(tf.tf * idf.idf, 6) AS tfidf
    FROM tf JOIN idf USING (term)
    """,
)
def r2_tfidf_scores(spark, sf_dir):
    """Smoothed TF-IDF features over a fixed vocabulary
    (functions/ranking.tfidf_scores) — the classic quality-classifier /
    near-dup feature extractor; posting table shuffles once, idf
    broadcast. tf/df are integers, so ROUND 6 absorbs only ln's ~1 ulp."""
    from cdrc_semantic_search_spark.functions.ranking import tfidf_scores

    d = load(spark, sf_dir, "documents")
    out = tfidf_scores(d, ["data", "model", "spark", "energy"])
    return out.select("id", "term", F.round("tfidf", 6).alias("tfidf"))


@register(
    "ev_pmi_pairs",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n_users AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n FROM events),
    per_type AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS cnt FROM ut GROUP BY event_type),
    pair AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS DOUBLE) AS n_ab
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_users_both,
           ROUND(ln(n_ab * (SELECT n FROM n_users) / (pa.cnt * pb.cnt)), 6) AS pmi
    FROM pair
    JOIN per_type pa ON pa.event_type = type_a
    JOIN per_type pb ON pb.event_type = type_b
    """,
)
def ev_pmi_pairs(spark, sf_dir):
    """Pointwise mutual information between event-type pairs sharing a
    user — the co-occurrence statistic KG/recommendation pipelines mine
    for implicit edges. One distinct (user, type) shuffle; the per-user
    self-join fans out only by a user's distinct types (bounded, unlike
    a per-token join); type marginals broadcast."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct().persist()  # 3 branches
    n_users = ev.agg(F.countDistinct("user_id").cast("double").alias("n"))
    per_type = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    )
    pa = per_type.select(F.col("event_type").alias("type_a"), F.col("cnt").alias("cnt_a"))
    pb = per_type.select(F.col("event_type").alias("type_b"), F.col("cnt").alias("cnt_b"))
    return (
        pair.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_users_both"),
            F.round(
                F.log(F.col("n_ab") * F.col("n") / (F.col("cnt_a") * F.col("cnt_b"))), 6
            ).alias("pmi"),
        )
    )


@register(
    "doc_zscore_norm",
    """
    SELECT doc_id, source,
           ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY source))
                 / STDDEV_SAMP(n_chars) OVER (PARTITION BY source), 6) AS z
    FROM documents
    """,
)
def doc_zscore_norm(spark, sf_dir):
    """Per-group z-score standardization (feature scaling before a
    quality classifier): one shuffle on the group key; mean and sample
    stddev share the window partition."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source")
    return d.select(
        "doc_id",
        "source",
        F.round(
            (F.col("n_chars") - F.avg("n_chars").over(w))
            / F.stddev_samp("n_chars").over(w),
            6,
        ).alias("z"),
    )


@register("dedup_embedding_lsh", value_oracles.lazy("dedup_embedding_lsh"))
def dedup_embedding_lsh(spark, sf_dir):
    """Embedding near-dup at corpus scale: random-hyperplane LSH buckets →
    exact cosine re-check (operators/similarity.cosine_pairs_lsh). Runs
    over the FULL embeddings table plus a shifted copy of the first 50
    vectors (guaranteed duplicates — identical vectors always share every
    bucket, so LSH must surface ≥ 50 pairs). Shuffle is on (band, bucket),
    never all-pairs. The seeded buckets are deterministic, so the oracle
    is a VALUES literal from the pure-NumPy twin (value_oracles.py)."""
    from cdrc_semantic_search_spark.operators.similarity import cosine_pairs_lsh

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = e.filter("vec_id < 50").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    uni = e.unionByName(dup)
    dim = len(e.select("embedding").first()[0])
    return cosine_pairs_lsh(
        uni, "vec_id", "embedding", dim=dim, threshold=0.9, n_planes=16, n_bands=4
    ).select("id_a", "id_b", F.round("score", 6).alias("score"))


# =====================================================================
# text analysis (training-data pipeline operators)
# =====================================================================

_SQL_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_SQL_SW_EN = "['the','and','of','to','a','in','is','it','that','for']"
_SQL_SW_FR = "['le','la','et','les','des','un','une','du','est','dans']"
_SQL_SW_DE = "['der','die','und','das','ein','ist','nicht','mit','den','von']"
_SQL_SW_ES = "['el','la','de','que','y','en','un','es','los','por']"


@register(
    "ta_quality_features",
    f"""
    SELECT doc_id, q_n_chars, q_n_tokens,
           ROUND(q_punct_ratio, 4) AS q_punct_ratio,
           ROUND(q_distinct_ratio, 4) AS q_distinct_ratio,
           ROUND(q_stopword_ratio, 4) AS q_stopword_ratio
    FROM (
        SELECT doc_id,
               CAST(length(text) AS INT) AS q_n_chars,
               CAST(len(toks) AS INT) AS q_n_tokens,
               CASE WHEN length(text) > 0 THEN
                    CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
               ELSE 0.0 END AS q_punct_ratio,
               CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS q_distinct_ratio,
               CASE WHEN len(toks) > 0 THEN
                    CAST(len(list_filter(toks, x -> list_contains({_SQL_SW_EN}, x))) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS q_stopword_ratio
        FROM (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents WHERE doc_id < 100)
    )
    """,
)
def ta_quality_features(spark, sf_dir):
    """Quality-scoring features (length/punct/stopword/diversity ratios) —
    the SQL-checkable subset of operators/text_analysis.quality_features."""
    from cdrc_semantic_search_spark.operators.text_analysis import quality_features

    d = load(spark, sf_dir, "documents").filter("doc_id < 100").select("doc_id", "text")
    out = quality_features(d, "text")
    return out.select(
        "doc_id",
        F.col("q_n_chars").cast("int").alias("q_n_chars"),
        F.col("q_n_tokens").cast("int").alias("q_n_tokens"),
        "q_punct_ratio",
        "q_distinct_ratio",
        "q_stopword_ratio",
    )


@register(
    "ta_language_id",
    f"""
    SELECT lang_guess, CAST(COUNT(*) AS BIGINT) AS n_docs FROM (
        SELECT doc_id,
            CASE WHEN greatest(r_en, r_fr, r_de, r_es) = 0 THEN 'und'
                 WHEN r_en = greatest(r_en, r_fr, r_de, r_es) THEN 'en'
                 WHEN r_fr = greatest(r_en, r_fr, r_de, r_es) THEN 'fr'
                 WHEN r_de = greatest(r_en, r_fr, r_de, r_es) THEN 'de'
                 ELSE 'es' END AS lang_guess
        FROM (
            SELECT doc_id,
                CASE WHEN len(toks)>0 THEN CAST(len(list_filter(toks, x -> list_contains({_SQL_SW_EN}, x))) AS DOUBLE)/len(toks) ELSE 0.0 END AS r_en,
                CASE WHEN len(toks)>0 THEN CAST(len(list_filter(toks, x -> list_contains({_SQL_SW_FR}, x))) AS DOUBLE)/len(toks) ELSE 0.0 END AS r_fr,
                CASE WHEN len(toks)>0 THEN CAST(len(list_filter(toks, x -> list_contains({_SQL_SW_DE}, x))) AS DOUBLE)/len(toks) ELSE 0.0 END AS r_de,
                CASE WHEN len(toks)>0 THEN CAST(len(list_filter(toks, x -> list_contains({_SQL_SW_ES}, x))) AS DOUBLE)/len(toks) ELSE 0.0 END AS r_es
            FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
        )
    ) GROUP BY lang_guess
    """,
)
def ta_language_id(spark, sf_dir):
    """Language-ID heuristic (stopword-ratio argmax) aggregated per corpus.
    DataFrame-level detect_language projects the token array once — the four
    per-language ratios share one regexp split per row."""
    from cdrc_semantic_search_spark.operators.text_analysis import detect_language

    d = load(spark, sf_dir, "documents")
    # fan_out: the tokenize+4-ratio codegen chain is the whole cost and
    # runs single-task on a single-row-group file (guide §2.5)
    return (
        detect_language(fan_out(d.select("text")), "text")
        .groupBy("lang_guess")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@register(
    "ta_fingerprint",
    """
    SELECT doc_id, md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
    FROM documents WHERE doc_id < 100
    """,
)
def ta_fingerprint(spark, sf_dir):
    """Document fingerprinting — md5 over whitespace-normalized text (the
    cross-engine-checkable twin of text_analysis.fingerprint/xxhash64)."""
    d = load(spark, sf_dir, "documents").filter("doc_id < 100")
    norm = F.trim(F.regexp_replace(F.col("text"), "\\s+", " "))
    return d.select("doc_id", F.md5(norm).alias("fp"))


@register(
    "ta_token_counts",
    f"""
    SELECT source,
           CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS total_tokens,
           CAST(MAX(len({_SQL_TOKS})) AS BIGINT) AS max_tokens
    FROM documents GROUP BY source
    """,
)
def ta_token_counts(spark, sf_dir):
    """Token counting rolled up per source."""
    d = load(spark, sf_dir, "documents")
    n = T.token_count(F.col("text"))
    return d.groupBy("source").agg(
        F.sum(n).cast("long").alias("total_tokens"),
        F.max(n).cast("long").alias("max_tokens"),
    )


@register(
    "ta_bpe_token_counts",
    """
    SELECT source,
           CAST(SUM(len(regexp_extract_all(lower(text), '''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\\s'']+'))) AS BIGINT) AS total_bpe_tokens,
           CAST(MAX(len(regexp_extract_all(lower(text), '''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\\s'']+'))) AS BIGINT) AS max_bpe_tokens
    FROM documents GROUP BY source
    """,
)
def ta_bpe_token_counts(spark, sf_dir):
    """BPE-ish token counting per source — what a BPE vocab sees (digit /
    punctuation runs and contractions count separately), vs the
    whitespace counter in ta_token_counts. Catalyst regexp_extract_all;
    the pattern avoids lookarounds so Java regex ≡ RE2."""
    d = load(spark, sf_dir, "documents")
    n = T.bpe_token_count(F.col("text"))
    return d.groupBy("source").agg(
        F.sum(n).cast("long").alias("total_bpe_tokens"),
        F.max(n).cast("long").alias("max_bpe_tokens"),
    )


@register(
    "ta_repetition_ratio",
    f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(
               range(len(toks) - 1),
               i -> toks[i + 1] || ' ' || toks[i + 2]
             )) AS bg
      FROM d WHERE len(toks) >= 2
    ),
    cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    top AS (SELECT doc_id, MAX(c) AS top FROM cnt GROUP BY 1)
    SELECT d.doc_id,
           CAST(len(d.toks) AS INTEGER) AS n_tokens,
           CAST(top.top AS DOUBLE) / CAST(len(d.toks) - 1 AS DOUBLE)
             AS top_bigram_share
    FROM d LEFT JOIN top USING (doc_id)
    """,
)
def ta_repetition_ratio(spark, sf_dir):
    """Gopher-style repetition filter signal: share of a document's
    bigrams taken by its most frequent bigram
    (operators/text_analysis.bigram_repetition). The int/int double
    division is bit-identical across engines, so no rounding is needed."""
    from cdrc_semantic_search_spark.operators.text_analysis import bigram_repetition

    return bigram_repetition(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "ta_common_token_score",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents),
    vocab AS (SELECT t, COUNT(*) AS gc FROM tok GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total FROM tok)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(gc) AS DOUBLE)
             / CAST(COUNT(*) * (SELECT total FROM tot) AS DOUBLE)
             AS common_score
    FROM tok JOIN vocab USING (t) GROUP BY doc_id
    """,
)
def ta_common_token_score(spark, sf_dir):
    """Corpus-frequency quality signal (text_analysis.common_token_score):
    mean corpus frequency of a doc's tokens. Integer accumulation only —
    order-independent and exact in both engines; one final int/int double
    division (docs with zero tokens are absent from both sides)."""
    from cdrc_semantic_search_spark.operators.text_analysis import common_token_score

    return common_token_score(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "split_train_val_test",
    """
    WITH b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('split|' || doc_id), 1, 8)) AS UBIGINT) % 10000 AS bkt
        FROM documents
    )
    SELECT CASE WHEN bkt < 8000 THEN 'train'
                WHEN bkt < 9000 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM b GROUP BY 1
    """,
)
def split_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split keyed on doc_id
    (operators/split.deterministic_split): md5-bucket thresholds, so the
    assignment is a pure function of the key — stable across runs,
    partitionings, and engines (the DuckDB oracle reproduces every
    bucket), unlike randomSplit which reassigns rows after a repartition."""
    from cdrc_semantic_search_spark.operators.split import deterministic_split

    d = load(spark, sf_dir, "documents")
    out = deterministic_split(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@register(
    "decontaminate_train",
    """
    WITH b AS (
        SELECT doc_id, text,
               CASE WHEN CAST(('0x' || substr(md5('split|' || doc_id), 1, 8)) AS UBIGINT) % 10000 < 8000
                    THEN 'train' ELSE 'holdout' END AS split
        FROM documents
    ),
    t AS (
        SELECT doc_id, split,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM b
    ),
    sh AS (
        SELECT doc_id, split,
               unnest(list_distinct(
                   CASE WHEN len(toks) >= 5
                        THEN list_transform(generate_series(1, len(toks) - 4),
                                            i -> array_to_string(list_slice(toks, i, i + 4), ' '))
                        ELSE list_filter([array_to_string(toks, ' ')], x -> x <> '')
                   END
               )) AS s
        FROM t
    ),
    hold AS (SELECT DISTINCT s FROM sh WHERE split = 'holdout')
    SELECT sh.doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM sh JOIN hold USING (s)
    WHERE sh.split = 'train'
    GROUP BY sh.doc_id
    """,
)
def decontaminate_train(spark, sf_dir):
    """Eval-set decontamination (operators/dedup.cross_split_contamination):
    train docs sharing ≥1 5-word shingle with the holdout, via a
    broadcast semi-probe of the distinct holdout shingle hashes against
    the train posting table — the 10^12-doc train side never shuffles.
    The split itself is the deterministic md5-bucket assignment, so both
    engines derive identical membership; the oracle joins on shingle
    STRINGS where Spark joins on xxhash64 (collisions ~2^-64)."""
    from cdrc_semantic_search_spark.operators.dedup import cross_split_contamination
    from cdrc_semantic_search_spark.operators.split import deterministic_split

    d = deterministic_split(
        load(spark, sf_dir, "documents"),
        "doc_id",
        {"train": 0.8, "holdout": 0.2},
    )
    return cross_split_contamination(
        d, "doc_id", "text", "split", train="train", holdout=("holdout",), k=5
    )


@register(
    "pack_token_bins",
    """
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST(FLOOR((cum - 1) / 512) AS BIGINT) AS bin
    FROM c
    """,
)
def pack_token_bins(spark, sf_dir):
    """Deterministic sequence packing: docs stream into 512-token bins
    per source in doc_id order (bin = ⌊(cumulative−1)/budget⌋) — the
    batch-construction step before LLM training. One window cumsum per
    group key, no UDFs; the assignment is a pure function of
    (source, doc_id order), stable across partitionings. (Greedy
    first-fit packing is inherently sequential; the streaming-cumsum bin
    is the scalable deterministic variant.)"""
    from cdrc_semantic_search_spark.functions.text import token_count

    d = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = d.select(
        "doc_id", "source", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - 1) / 512).cast("long").alias("bin"),
    )


@register(
    "ta_lm_cross_entropy",
    f"""
    WITH t AS (
        SELECT doc_id, toks FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
        WHERE len(toks) >= 2
    ),
    bi AS (
        SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2
        FROM (SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(toks) - 1),
                                           i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS bg
              FROM t)
    ),
    ref AS (SELECT * FROM bi WHERE doc_id < 250),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM ref GROUP BY w1, w2),
    cu AS (SELECT w1, COUNT(*) AS cu FROM ref GROUP BY w1),
    v AS (
        -- vocabulary over ALL reference docs (t filters len>=2, which
        -- would silently shrink V when a ref doc has a single token)
        SELECT COUNT(DISTINCT tok) AS v FROM (
            SELECT unnest({_SQL_TOKS}) AS tok FROM documents WHERE doc_id < 250
        )
    ),
    scored AS (
        SELECT bi.doc_id,
               CAST(ROUND(ln((COALESCE(cb.cb, 0) + 1.0) / (COALESCE(cu.cu, 0) + v.v)), 7)
                    AS DECIMAL(18,7)) AS term
        FROM bi LEFT JOIN cb USING (w1, w2) LEFT JOIN cu USING (w1) CROSS JOIN v
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(-CAST(SUM(term) AS DOUBLE) / COUNT(*), 6) AS ce
    FROM scored GROUP BY doc_id
    """,
)
def ta_lm_cross_entropy(spark, sf_dir):
    """CCNet-style perplexity quality filter: per-doc cross-entropy under
    an add-one bigram LM trained on the doc_id<250 reference slice
    (bounded by construction at ANY scale factor → both count tables
    broadcast; the corpus bigram stream scores map-side and shuffles
    only on doc_id). operators/text_analysis.bigram_cross_entropy."""
    from cdrc_semantic_search_spark.operators.text_analysis import (
        bigram_cross_entropy,
    )

    d = load(spark, sf_dir, "documents")
    return bigram_cross_entropy(d, d.filter("doc_id < 250"), "doc_id", "text")


@register(
    "emb_label_centroids",
    """
    WITH ex AS (
        SELECT label,
               UNNEST(range(len(embedding))) AS dim,
               UNNEST(embedding) AS x
        FROM embeddings
    ),
    per AS (
        SELECT label, dim,
               ROUND(CAST(ROUND(SUM(CAST(x AS DECIMAL(38,18))), 8) AS DOUBLE)
                     / COUNT(*), 6) AS m,
               COUNT(*) AS n
        FROM ex GROUP BY label, dim
    )
    SELECT CAST(label AS INTEGER) AS label, CAST(MAX(n) AS BIGINT) AS n,
           array_to_string(list(CAST(CAST(m AS DECIMAL(12,6)) AS VARCHAR) ORDER BY dim), ',') AS centroid
    FROM per GROUP BY label
    """,
)
def emb_label_centroids(spark, sf_dir):
    """Per-label embedding centroids (operators/rollup.label_centroids):
    the class-prototype builder for centroid classifiers / few-shot label
    propagation. Sums run in DECIMAL(38,18) so the mean is accumulation-
    order-independent — the only way a float reduction can hash-match
    across engines AND partitionings; centroid renders as a fixed-point
    decimal string (double→string formatting differs between engines,
    DECIMAL(12,6)→string does not; arrays can't be driver-hashed)."""
    from cdrc_semantic_search_spark.operators.rollup import label_centroids

    e = load(spark, sf_dir, "embeddings")
    out = label_centroids(e, "label", "embedding", round_digits=6)
    return out.select(
        "label",
        "n",
        F.array_join(
            F.transform(
                F.col("centroid"), lambda m: m.cast("decimal(12,6)").cast("string")
            ),
            ",",
        ).alias("centroid"),
    )


@register(
    "skew2_distinct_two_phase",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def skew2_distinct_two_phase(spark, sf_dir):
    """Skew-safe exact distinct count (operators/rollup.
    distinct_count_two_phase): phase 1 dedupes on the composite
    (event_type, user_id) — a hot event type's users spread across the
    cluster instead of funneling into one reducer — phase 2 counts per
    type. Result identical to single-phase COUNT(DISTINCT) (the oracle),
    which must co-locate every distinct value of a hot key on one task."""
    from cdrc_semantic_search_spark.operators.rollup import distinct_count_two_phase

    ev = load(spark, sf_dir, "events")
    return distinct_count_two_phase(ev, "event_type", "user_id")


@register(
    "merge_upsert_docs",
    """
    WITH t AS (SELECT doc_id, source, n_chars FROM documents),
    u AS (
        SELECT doc_id, 'updated' AS source, n_chars + 1 AS n_chars
        FROM documents WHERE doc_id < 30
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, 'new' AS source, CAST(0 AS BIGINT) AS n_chars
        FROM documents WHERE doc_id < 20
    )
    SELECT COALESCE(u.doc_id, t.doc_id) AS doc_id,
           CASE WHEN u.doc_id IS NOT NULL THEN u.source ELSE t.source END AS source,
           CASE WHEN u.doc_id IS NOT NULL THEN u.n_chars ELSE t.n_chars END AS n_chars
    FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id
    """,
)
def merge_upsert_docs(spark, sf_dir):
    """MERGE INTO semantics (operators/split.merge_upsert): 30 updated
    rows replace their targets, 20 new rows append, everything else
    survives — one full-outer join + struct coalesce, the logical plan
    Iceberg/Delta MERGE compiles to."""
    from cdrc_semantic_search_spark.operators.split import merge_upsert

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    nct = dict(d.dtypes)["n_chars"]
    upd = (
        d.filter("doc_id < 30").select(
            "doc_id",
            F.lit("updated").alias("source"),
            (F.col("n_chars") + 1).cast(nct).alias("n_chars"),
        )
    ).unionByName(
        d.filter("doc_id < 20").select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.lit("new").alias("source"),
            F.lit(0).cast(nct).alias("n_chars"),
        )
    )
    return merge_upsert(d, upd, key_cols=["doc_id"])


@register(
    "stratified_sample_counts",
    """
    WITH r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY CAST(('0x' || substr(md5('sample|' || doc_id), 1, 8)) AS UBIGINT) % 10000, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS min_sampled_id
    FROM r WHERE (rn - 1) * 5 < n * 1 GROUP BY source  -- exact ⌈n·1/5⌉ quota, integer math
    """,
)
def stratified_sample_counts(spark, sf_dir):
    """Exact stratified 20% sample per source
    (operators/split.stratified_sample): every stratum keeps EXACTLY
    ⌈n·0.2⌉ rows, picked by deterministic md5-bucket rank — reproducible
    on any engine (the oracle reproduces the identical member set, not
    just the counts: min_sampled_id pins membership)."""
    from cdrc_semantic_search_spark.operators.split import stratified_sample

    d = load(spark, sf_dir, "documents")
    out = stratified_sample(d, "source", "doc_id", fraction=0.2)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.min("doc_id").cast("long").alias("min_sampled_id"),
    )


@register("sketch_approx_distinct", None)  # HLL estimates are engine-internal
def sketch_approx_distinct(spark, sf_dir):
    """HyperLogLog++ distinct estimation per event_type — the sketch
    aggregate a 100-TB pipeline uses where exact COUNT(DISTINCT) would
    shuffle every key (HLL registers are map-side mergeable, fixed-size
    state). rows-only: estimates are engine-specific; the ≤5%
    relative-error bound vs exact is pinned in pytest
    (test_operators.test_approx_count_distinct_error_bound)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("approx_events"),
    )


@register("sketch_count_min", value_oracles.lazy("sketch_count_min"))
def sketch_count_min(spark, sf_dir):
    """Deterministic count-min sketch (operators/sketch, d=4 w=64 —
    width deliberately small so collisions make the overestimate real at
    sf0.01) over (event_type|user_id) keys, point-queried for the 20
    hottest exact keys: (key, exact_cnt, cms_est), cms_est ≥ exact_cnt
    always. Unlike the HLL entry (engine-internal registers, rows-only),
    these counters are pure crc32 arithmetic — the twin re-derives every
    counter and the hash check is exact."""
    from cdrc_semantic_search_spark.operators.sketch import (
        cms_estimate,
        count_min_sketch,
    )

    ev = load(spark, sf_dir, "events").select(
        F.concat_ws(
            "|", F.col("event_type"), F.col("user_id").cast("string")
        ).alias("key")
    )
    exact = ev.groupBy("key").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # top-20 via orderBy+limit (TakeOrderedAndProject: per-partition
    # top-k merged on the driver) instead of a row_number window over a
    # single-partition global sort — same deterministic total order
    # (exact_cnt desc, key asc), same 20 rows, no global sort exchange
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("key")).limit(20)
    sk = count_min_sketch(ev, "key", depth=4, width=64)
    est = cms_estimate(sk, top.select("key"), "key", depth=4, width=64)
    return top.join(est, "key").select("key", "exact_cnt", "cms_est")


@register(
    "ta_dup_ngram_fraction",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    g AS (
        SELECT doc_id, unnest(list_filter(
            CASE WHEN len(w) >= 5
                 THEN list_transform(range(1, len(w) - 3),
                                     i -> array_to_string(w[i:i+4], ' '))
                 ELSE [array_to_string(w, ' ')] END,
            s -> s <> '')) AS gram
        FROM t
    ),
    dg AS (SELECT DISTINCT doc_id, gram FROM g),
    freq AS (SELECT gram, COUNT(*) AS n_docs FROM dg GROUP BY gram)
    SELECT dg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_ngrams,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_ngrams,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS dup_fraction
    FROM dg JOIN freq USING (gram)
    GROUP BY dg.doc_id
    """,
)
def ta_dup_ngram_fraction(spark, sf_dir):
    """Gopher-style duplicate 5-gram fraction per document: the share of
    a doc's distinct word 5-grams that appear in any other document —
    the boilerplate/template filter of large-corpus curation. Two
    map-side-combined aggregations over the (doc, gram) key space; the
    oracle replicates the shingle construction (including the
    shorter-than-5-tokens degenerate join) in DuckDB list functions."""
    from cdrc_semantic_search_spark.operators.text_analysis import dup_ngram_fraction

    d = load(spark, sf_dir, "documents")
    return dup_ngram_fraction(d, "doc_id", "text", n=5)


@register(
    "ta_cooccurrence_lift",
    f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    tdf AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok),
    pairs AS (
        SELECT a.tok AS token_a, b.tok AS token_b,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
    )
    SELECT token_a, token_b, n_ab,
           CAST(n_ab * n_docs AS DOUBLE) / (fa.df * fb.df) AS lift
    FROM pairs
    JOIN tdf fa ON fa.tok = token_a
    JOIN tdf fb ON fb.tok = token_b
    CROSS JOIN n
    """,
)
def ta_cooccurrence_lift(spark, sf_dir):
    """Token co-occurrence lift (PMI's ratio, log-free so the int/int
    double division hashes identically across engines) — the statistical
    relation-strength scorer a KG applies to candidate entity pairs.
    Distinct (doc, token) → per-doc self-join → pair counts vs
    independence baseline from document frequencies."""
    from cdrc_semantic_search_spark.operators.text_analysis import (
        cooccurrence_lift,
    )

    d = load(spark, sf_dir, "documents")
    return cooccurrence_lift(d, "doc_id", "text")


@register("ta_winnowing", value_oracles.lazy("ta_winnowing"))
def ta_winnowing(spark, sf_dir):
    """Winnowing fingerprint counts. xxhash64 isn't SQL-portable, so the
    oracle is a VALUES literal from a pure-Python twin that carries its
    own XXH64 (verified against public test vectors AND F.xxhash64 in
    tests/test_value_oracles.py)."""
    from cdrc_semantic_search_spark.operators.text_analysis import winnowing_fingerprints

    d = load(spark, sf_dir, "documents").filter("doc_id < 100")
    return d.select(
        "doc_id",
        F.size(winnowing_fingerprints(F.col("text"), k=5, window=4)).alias("n_fps"),
    )


# =====================================================================
# graph / canonicalization
# =====================================================================

@register(
    "cc_components",
    """
    WITH RECURSIVE e AS (
        SELECT DISTINCT l_suppkey AS a, 1000 + l_partkey % 100 AS b
        FROM lineitem WHERE l_orderkey < 300
    ),
    sym(a, b) AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    reach(n, m) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
    )
    SELECT n AS id, LEAST(n, MIN(m)) AS component FROM reach GROUP BY n
    """,
)
def cc_components(spark, sf_dir):
    """Connected components by iterative min-label propagation vs a DuckDB
    recursive-CTE transitive closure — the canonicalization kernel
    (SURVEY §4.3) cross-checked exactly."""
    from cdrc_semantic_search_spark.operators.canonicalize import connected_components

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("id_a"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("id_b"),
    ).distinct()
    return connected_components(edges).select("id", "component")


@register(
    "graph_component_sizes",
    """
    WITH RECURSIVE e AS (
        SELECT DISTINCT l_suppkey AS a, 1000 + l_partkey % 2000 AS b
        FROM lineitem WHERE l_orderkey < 80
    ),
    sym(a, b) AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    reach(n, m) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
    ),
    labels AS (
        SELECT n AS id, LEAST(n, MIN(m)) AS component FROM reach GROUP BY n
    ),
    sizes AS (
        SELECT component, COUNT(*) AS size FROM labels GROUP BY component
    )
    SELECT CAST(size AS BIGINT) AS component_size,
           CAST(COUNT(*) AS BIGINT) AS n_components
    FROM sizes GROUP BY size
    """,
)
def graph_component_sizes(spark, sf_dir):
    """Component-size distribution: connected components → size per
    component → component count per size, the fragmentation health check
    on canonicalization output (a giant component plus dust is healthy; a
    flat distribution means the similarity threshold is too tight). Two
    cheap aggregations composed on the CC kernel's labels; the sparser %2000 bucket graph actually fragments (dozens of components across many sizes at sf0.01)."""
    from cdrc_semantic_search_spark.operators.canonicalize import connected_components

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 80")
    edges = li.select(
        F.col("l_suppkey").alias("id_a"),
        (F.lit(1000) + F.col("l_partkey") % 2000).alias("id_b"),
    ).distinct()
    labels = connected_components(edges)
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("component_size"))
    return sizes.groupBy("component_size").agg(
        F.count(F.lit(1)).alias("n_components")
    )


@register(
    "cc_incremental",
    """
    WITH RECURSIVE e AS (
        SELECT DISTINCT l_suppkey AS a, 1000 + l_partkey % 500 AS b
        FROM lineitem WHERE l_orderkey < 300
    ),
    sym(a, b) AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    reach(n, m) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
    )
    SELECT n AS id, LEAST(n, MIN(m)) AS component FROM reach GROUP BY n
    """,
)
def cc_incremental(spark, sf_dir):
    """Incremental canonicalization maintenance: converge components on
    the first half of the edges, then fold the second half in with
    incremental_components — cost proportional to the NEW batch, never
    the full graph (the 10^12-mention regime, where labels are a
    materialized table and each micro-batch of high-similarity mention
    pairs patches it). The oracle is the recursive-CTE transitive closure
    over the UNION of both waves — incremental ≡ full rebuild, exactly."""
    from cdrc_semantic_search_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("id_a"),
        (F.lit(1000) + F.col("l_partkey") % 500).alias("id_b"),
        "l_orderkey",
    )
    wave1 = edges.filter("l_orderkey < 150").drop("l_orderkey").distinct()
    wave2 = edges.filter("l_orderkey >= 150").drop("l_orderkey").distinct()
    base = connected_components(wave1)
    return incremental_components(base, wave2).select("id", "component")


@register(
    "graph_scc",
    """
    WITH RECURSIVE e AS (
        SELECT l_suppkey AS a, 1000 + l_partkey % 80 AS b
        FROM lineitem WHERE l_orderkey < 200 AND l_returnflag = 'R'
        UNION
        SELECT 1000 + l_partkey % 80 AS a, l_suppkey AS b
        FROM lineitem WHERE l_orderkey < 200 AND l_returnflag = 'A'
    ),
    reach(n, m) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a
    ),
    v AS (SELECT a AS id FROM e UNION SELECT b AS id FROM e),
    mutual AS (
        SELECT l.n AS id, l.m AS other
        FROM reach l JOIN reach r ON l.n = r.m AND l.m = r.n
    )
    SELECT v.id, COALESCE(LEAST(v.id, MIN(other)), v.id) AS scc_id
    FROM v LEFT JOIN mutual ON mutual.id = v.id
    GROUP BY v.id
    """,
)
def graph_scc(spark, sf_dir):
    """Strongly connected components over a DIRECTED supplier↔bucket
    graph (returned lines point supplier→bucket, accepted lines point
    back — the cyclic core models provenance loops a KG must flag).
    FB-trim min-label coloring (operators/graph) vs a DuckDB
    mutual-reachability oracle: two recursive transitive closures joined
    transposed. At sf0.01 the fixture is one 154-vertex cyclic core plus
    trivial fringe — trim settles the fringe without a flood."""
    from cdrc_semantic_search_spark.operators.graph import (
        strongly_connected_components,
    )

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 200")
    fwd = li.filter("l_returnflag = 'R'").select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 80).alias("dst"),
    )
    bwd = li.filter("l_returnflag = 'A'").select(
        (F.lit(1000) + F.col("l_partkey") % 80).alias("src"),
        F.col("l_suppkey").alias("dst"),
    )
    return strongly_connected_components(fwd.unionByName(bwd))


@register(
    "graph_topo_layers",
    """
    WITH RECURSIVE e AS (
        SELECT DISTINCT 1000 * l_linenumber + l_suppkey % 300 AS a,
               1000 * (l_linenumber + 1) + l_partkey % 300 AS b
        FROM lineitem WHERE l_orderkey < 400
    ),
    v AS (SELECT a AS id FROM e UNION SELECT b AS id FROM e),
    roots AS (
        SELECT id FROM v WHERE id NOT IN (SELECT b FROM e)
    ),
    walk(id, d) AS (
        SELECT id, 0 FROM roots
        UNION
        SELECT e.b, walk.d + 1 FROM walk JOIN e ON e.a = walk.id
    )
    SELECT id, CAST(MAX(d) AS INT) AS layer FROM walk GROUP BY id
    """,
)
def graph_topo_layers(spark, sf_dir):
    """Topological layering (longest path from any root) over a
    line-number-leveled DAG — the dependency-ordering pass of a
    derivation graph (operators/graph.topo_layers, Kahn peel with one
    whole layer settled per round). The oracle walks every root-to-node
    path in a recursive CTE and takes MAX(d); the fixture is cycle-free
    by construction (edges always climb one level), so no layer is NULL
    — the cyclic branch is pinned in pytest instead."""
    from cdrc_semantic_search_spark.operators.graph import topo_layers

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 400")
    e = li.select(
        (F.lit(1000) * F.col("l_linenumber") + F.col("l_suppkey") % 300).alias(
            "src"
        ),
        (
            F.lit(1000) * (F.col("l_linenumber") + 1) + F.col("l_partkey") % 300
        ).alias("dst"),
    )
    return topo_layers(e)


@register(
    "graph_tree_depth",
    """
    WITH ids AS (
        SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS id
        FROM orders WHERE o_orderkey < 6000
    ),
    e AS (SELECT id AS c, id - 1 AS p FROM ids WHERE id % 1000 <> 0),
    v AS (SELECT c AS id FROM e UNION SELECT p FROM e)
    SELECT CAST(v.id AS BIGINT) AS id,
           CAST(v.id % 1000 AS INT) AS depth,
           CAST(v.id - v.id % 1000 AS BIGINT) AS root
    FROM v
    """,
)
def graph_tree_depth(spark, sf_dir):
    """Pointer-doubling depth/root over ~1000-deep provenance chains
    (operators/graph.tree_depth_doubling): dense ids 0..N-1 chained
    parent = id−1 with a chain break every 1000 — the DEEP case where
    the Kahn-peel family's O(depth·|E|) materialization bound bites and
    doubling finishes in ⌈log₂ depth⌉ ≈ 10 rounds instead of ~1000. The
    oracle exploits that depth/root are closed-form for this fixture
    (depth = id mod 1000, root = id − depth) — the closed form IS the
    chain semantics, so it pins the full (id, depth, root) triple; the
    randomized-forest and error branches are pytest-pinned. The global
    row_number is fixture construction, not operator shape."""
    from cdrc_semantic_search_spark.operators.graph import tree_depth_doubling

    ids = (
        load(spark, sf_dir, "orders")
        .filter("o_orderkey < 6000")
        .select(
            (
                F.row_number().over(Window.orderBy("o_orderkey")) - 1
            ).cast("bigint").alias("id")
        )
    )
    edges = ids.filter(F.col("id") % 1000 != 0).select(
        F.col("id").alias("child"), (F.col("id") - 1).alias("parent")
    )
    return tree_depth_doubling(edges).select(
        F.col("id").cast("bigint").alias("id"),
        "depth",
        F.col("root").cast("bigint").alias("root"),
    )


@register(
    "graph_bfs_distances",
    """
    WITH RECURSIVE e AS (
        SELECT DISTINCT l_suppkey AS src, 1000 + l_partkey % 100 AS dst
        FROM lineitem WHERE l_orderkey < 300
    ),
    ue AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
    walk(id, d) AS (
        SELECT MIN(src), 0 FROM e
        UNION
        SELECT ue.v, walk.d + 1
        FROM walk JOIN ue ON ue.u = walk.id
        WHERE walk.d < 6
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(MIN(d) AS INTEGER) AS dist
    FROM walk GROUP BY id
    """,
)
def graph_bfs_distances(spark, sf_dir):
    """Unweighted shortest paths (BFS frontier expansion,
    operators/graph.bfs_distances) from the smallest supplier over the
    same undirected supplier→bucket graph as cc_components, vs a DuckDB
    recursive-CTE walk capped at the same depth."""
    from cdrc_semantic_search_spark.operators.graph import bfs_distances

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    ).distinct()
    sources = edges.agg(F.min("src").alias("id"))
    out = bfs_distances(edges, sources, max_depth=6)
    return out.select(
        F.col("id").cast("long").alias("id"), F.col("dist").cast("int").alias("dist")
    )


@register(
    "graph_pagerank",
    """
    WITH e AS (
        SELECT DISTINCT l_suppkey AS src, 1000 + l_partkey % 100 AS dst
        FROM lineitem WHERE l_orderkey < 300
    ),
    v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM v),
    r1 AS (
        SELECT v.id,
               0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(SUM(r0.rank / deg.outdeg), 0) AS rank
        FROM v LEFT JOIN e ON e.dst = v.id
               LEFT JOIN deg ON deg.src = e.src
               LEFT JOIN r0 ON r0.id = e.src
        GROUP BY v.id
    ),
    r2 AS (
        SELECT v.id,
               0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(SUM(r1.rank / deg.outdeg), 0) AS rank
        FROM v LEFT JOIN e ON e.dst = v.id
               LEFT JOIN deg ON deg.src = e.src
               LEFT JOIN r1 ON r1.id = e.src
        GROUP BY v.id
    ),
    r3 AS (
        SELECT v.id,
               0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(SUM(r2.rank / deg.outdeg), 0) AS rank
        FROM v LEFT JOIN e ON e.dst = v.id
               LEFT JOIN deg ON deg.src = e.src
               LEFT JOIN r2 ON r2.id = e.src
        GROUP BY v.id
    )
    SELECT id, ROUND(rank, 6) AS rank FROM r3
    """,
)
def graph_pagerank(spark, sf_dir):
    """Fixed-iteration (3) simplified PageRank over the same supplier→bucket
    graph as cc_components, hash-matched against a DuckDB oracle that
    unrolls the three iterations as chained CTEs (recursive CTEs cannot
    aggregate in the recursive member). The entity-importance consumer of
    the materialized kg_edges table (operators/graph.pagerank_fixed)."""
    from cdrc_semantic_search_spark.operators.graph import pagerank_fixed

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    # no .distinct() here: pagerank_fixed normalizes+distincts internally
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    out = pagerank_fixed(edges, n_iter=3, damping=0.85)
    return out.select("id", F.round("rank", 6).alias("rank"))


@register(
    "graph_triangles",
    """
    WITH e AS (
        SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey) AS a,
                        GREATEST(a.l_suppkey, b.l_suppkey) AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        WHERE a.l_orderkey < 200 AND b.l_orderkey < 200
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.b = e2.a
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangles(spark, sf_dir):
    """Triangle counting over the supplier co-occurrence graph (suppliers
    sharing an order are connected). Ordered-wedge formulation — each
    triangle found once as a < b < c (operators/graph.triangle_count);
    degree-orientation is the documented scale swap."""
    from cdrc_semantic_search_spark.operators.graph import triangle_count

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 200").select(
        "l_orderkey", "l_suppkey"
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb"))
    # no .distinct() here: triangle_count normalizes+distincts internally
    edges = (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
    )
    return triangle_count(edges)


@register(
    "graph_linkpred_scores",
    """
    WITH e0 AS (
        SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey) AS a,
                        GREATEST(a.l_suppkey, b.l_suppkey) AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        WHERE a.l_orderkey < 200 AND b.l_orderkey < 200
    ),
    sym AS (SELECT a AS u, b AS n FROM e0 UNION ALL SELECT b, a FROM e0),
    deg AS (SELECT u AS vid, COUNT(*) AS deg FROM sym GROUP BY u),
    pairs AS (
        SELECT s1.u AS v, s2.u AS w, COUNT(*) AS common_cnt,
               SUM(1.0 / LN(d.deg)) AS aa
        FROM sym s1 JOIN sym s2 ON s1.n = s2.n AND s1.u < s2.u
             JOIN deg d ON d.vid = s1.n
        GROUP BY 1, 2
    ),
    nonadj AS (
        SELECT p.* FROM pairs p
        WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.a = p.v AND e0.b = p.w)
    )
    SELECT n.v, n.w, CAST(n.common_cnt AS BIGINT) AS common_cnt,
           ROUND(n.common_cnt * 1.0 / (dv.deg + dw.deg - n.common_cnt), 6)
               AS jaccard,
           ROUND(n.aa, 6) AS adamic_adar
    FROM nonadj n JOIN deg dv ON dv.vid = n.v JOIN deg dw ON dw.vid = n.w
    """,
)
def graph_linkpred_scores(spark, sf_dir):
    """Link prediction over the supplier co-occurrence graph: score every
    non-adjacent supplier pair sharing ≥1 partner by common-neighbour
    count, Jaccard, and Adamic-Adar (operators/graph.link_prediction_scores)
    — the "suggest a missing relation" consumer of the materialized entity
    graph. Oracle unrolls the wedge join + anti-join in plain SQL."""
    from cdrc_semantic_search_spark.operators.graph import link_prediction_scores

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 200").select(
        "l_orderkey", "l_suppkey"
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
    )
    out = link_prediction_scores(edges)
    return out.select(
        "v",
        "w",
        "common_cnt",
        F.round("jaccard", 6).alias("jaccard"),
        F.round("adamic_adar", 6).alias("adamic_adar"),
    )


@register(
    "graph_ppr_relatedness",
    """
    WITH e AS (
        SELECT DISTINCT l_suppkey AS src, 1000 + l_partkey % 100 AS dst
        FROM lineitem
        WHERE l_orderkey < 300 AND l_suppkey <> 1000 + l_partkey % 100
    ),
    seeds AS (SELECT * FROM (VALUES (1), (2), (3)) AS t(id)),
    v AS (SELECT src AS id FROM e UNION SELECT dst FROM e
          UNION SELECT id FROM seeds),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM e GROUP BY src),
    rs AS (
        SELECT v.id,
               CASE WHEN seeds.id IS NOT NULL THEN 1.0 / 3 ELSE 0.0 END AS s
        FROM v LEFT JOIN seeds ON seeds.id = v.id
    ),
    r0 AS (SELECT id, s AS rank FROM rs),
    r1 AS (
        SELECT rs.id, 0.15 * rs.s + 0.85 * COALESCE(agg.c, 0) AS rank
        FROM rs LEFT JOIN (
            SELECT e.dst AS id, SUM(r0.rank / deg.outdeg) AS c
            FROM e JOIN deg ON deg.src = e.src JOIN r0 ON r0.id = e.src
            GROUP BY e.dst
        ) agg ON agg.id = rs.id
    ),
    r2 AS (
        SELECT rs.id, 0.15 * rs.s + 0.85 * COALESCE(agg.c, 0) AS rank
        FROM rs LEFT JOIN (
            SELECT e.dst AS id, SUM(r1.rank / deg.outdeg) AS c
            FROM e JOIN deg ON deg.src = e.src JOIN r1 ON r1.id = e.src
            GROUP BY e.dst
        ) agg ON agg.id = rs.id
    ),
    r3 AS (
        SELECT rs.id, 0.15 * rs.s + 0.85 * COALESCE(agg.c, 0) AS rank
        FROM rs LEFT JOIN (
            SELECT e.dst AS id, SUM(r2.rank / deg.outdeg) AS c
            FROM e JOIN deg ON deg.src = e.src JOIN r2 ON r2.id = e.src
            GROUP BY e.dst
        ) agg ON agg.id = rs.id
    )
    SELECT id, ROUND(rank, 6) AS rank FROM r3
    """,
)
def graph_ppr_relatedness(spark, sf_dir):
    """Personalized PageRank (random walk with restart) from a 3-supplier
    seed set over the supplier→part-bucket graph — entity relatedness to a
    query set, the graph-expansion retrieval step after linking
    (operators/graph.personalized_pagerank). Oracle unrolls the three
    restart iterations as chained CTEs, like graph_pagerank."""
    from cdrc_semantic_search_spark.operators.graph import personalized_pagerank

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    seeds = spark.range(1, 4).select(F.col("id"))
    out = personalized_pagerank(edges, seeds, n_iter=3, damping=0.85)
    return out.select("id", F.round("rank", 6).alias("rank"))


def _kcore_oracle_sql(k: int = 2, rounds: int = 10) -> str:
    """Unrolled peeling oracle for graph_kcore: each CTE round recomputes
    within-survivor degrees and drops vertices below k. Peeling is
    idempotent once converged, so unrolling MORE rounds than the true
    peeling depth (7 at sf0.01) is safe — extra rounds are no-ops."""
    # AS MATERIALIZED: every round is referenced twice (both join sides);
    # DuckDB inlines plain CTEs, which would expand the chain 2^rounds-fold
    parts = [
        """
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT l_suppkey AS a, 10000 + l_partkey AS b
        FROM lineitem WHERE l_orderkey < 200
    ),
    sym AS MATERIALIZED (SELECT a AS u, b AS n FROM e0 UNION ALL SELECT b, a FROM e0),
    a0 AS MATERIALIZED (SELECT DISTINCT u FROM sym)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    a{i} AS MATERIALIZED (
        SELECT u FROM (
            SELECT s.u, COUNT(*) AS d
            FROM sym s JOIN a{i - 1} x ON x.u = s.u
                       JOIN a{i - 1} y ON y.u = s.n
            GROUP BY s.u
        ) WHERE d >= {k}
    )"""
        )
    parts.append(
        f"""
    SELECT s.u AS id, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM sym s JOIN a{rounds} x ON x.u = s.u
               JOIN a{rounds} y ON y.u = s.n
    GROUP BY s.u
    """
    )
    return "".join(parts)


@register("graph_kcore", _kcore_oracle_sql)
def graph_kcore(spark, sf_dir):
    """Maximal 2-core of the bipartite supplier↔part graph (l_orderkey
    < 200): peel weakly-connected vertices to fixpoint, keep each
    survivor's within-core degree (operators/graph.k_core) — the
    extraction-noise trim over materialized entity graphs. At sf0.01 the
    peel runs 7 rounds, 725 → 152 vertices; the oracle unrolls 10
    idempotent rounds of the same recurrence."""
    from cdrc_semantic_search_spark.operators.graph import k_core

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 200")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(10000) + F.col("l_partkey")).alias("dst"),
    )
    return k_core(edges, k=2)


@register(
    "mix_domain_weighted",
    """
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY CAST(('0x' || substr(md5('mix|' || doc_id), 1, 8))
                                 AS UBIGINT) % 10000,
                            doc_id
               ) AS rn
        FROM documents
        WHERE source IN ('src0', 'src1', 'src2')
    )
    SELECT doc_id, source FROM ranked
    WHERE rn <= CASE source WHEN 'src0' THEN 20
                            WHEN 'src1' THEN 12
                            WHEN 'src2' THEN 8
                            ELSE 0 END
    """,
)
def mix_domain_weighted(spark, sf_dir):
    """Deterministic domain mixing (operators/split.weighted_mix): a
    40-row corpus at 50/30/20 source composition, members chosen by
    md5-bucket rank so the mix is a pure function of doc_id — the
    pre-training composition step, reproducible on any engine (the
    oracle re-derives every member)."""
    from cdrc_semantic_search_spark.operators.split import weighted_mix

    d = load(spark, sf_dir, "documents")
    out = weighted_mix(
        d,
        "source",
        "doc_id",
        {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        total=40,
    )
    return out.select("doc_id", "source")


@register(
    "graph_degree_histogram",
    """
    WITH e AS (
        SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey) AS a,
                        GREATEST(a.l_suppkey, b.l_suppkey) AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        WHERE a.l_orderkey < 200 AND b.l_orderkey < 200
    ),
    deg AS (
        SELECT u, COUNT(*) AS deg
        FROM (SELECT a AS u FROM e UNION ALL SELECT b FROM e)
        GROUP BY u
    )
    SELECT CAST(deg AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_vertices
    FROM deg GROUP BY deg
    """,
)
def graph_degree_histogram(spark, sf_dir):
    """Degree distribution of the supplier co-occurrence graph — the
    aggregation-of-an-aggregation shape (degree per vertex, then vertex
    count per degree) every graph health check starts with; hub skew
    shows up as the heavy tail. Two map-side-combined aggregations, the
    second over ≤max_degree rows."""
    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 200").select(
        "l_orderkey", "l_suppkey"
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb"))
    und = (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("a"), F.col("sb").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("u"))
        .unionByName(und.select(F.col("b").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_vertices")
    )


def _ann_fixture(spark, sf_dir):
    """Shared ANN fixture for the ann_* queries: the deterministic
    training sample (vec_id < 256 SORTED — limit() would be
    partitioning-dependent), the 10 query vectors, and the corpus.
    One definition on purpose: several queries share VALUES oracles
    derived from these exact constants, so drift between copies would
    break a far-away hash at harness time."""
    import numpy as np

    e = load(spark, sf_dir, "embeddings")
    sample = np.array(
        [
            np.asarray(r["embedding"], dtype=np.float32)
            for r in e.filter("vec_id < 256").orderBy("vec_id").collect()
        ]
    )
    q = e.filter("vec_id < 10").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    return sample, q, c


@register("ann_pq_topk", value_oracles.lazy("ann_pq_topk"))
def ann_pq_topk(spark, sf_dir):
    """Product-quantization ADC top-k (operators/similarity.topk_pq_adc):
    the corpus scans as 8 one-byte codes per 64-dim vector (32×
    compression — the memory-side ANN lever, complementing IVF's
    candidate cut), queries resolve scores through broadcast lookup
    tables, each partition emits only its per-query top-k. Deterministic
    end-to-end (seeded per-subspace k-means on the sorted vec_id < 256
    sample; LUT kernel shared with the pure-NumPy twin so float32 sums
    are bit-identical), so the oracle is a VALUES literal; recall vs the
    exact scan is pinned in tests/test_ivf.py."""
    from cdrc_semantic_search_spark.operators.similarity import (
        topk_pq_adc,
        train_pq_codebooks,
    )

    sample, q, c = _ann_fixture(spark, sf_dir)
    books = train_pq_codebooks(sample, m=8, k=16, seed=42)
    out = topk_pq_adc(spark, q, c, books, k=5)
    return out.select("q_id", "c_id", F.round("score", 6).alias("score"), "rank")


@register("ann_ivfpq_topk", value_oracles.lazy("ann_ivfpq_topk"))
def ann_ivfpq_topk(spark, sf_dir):
    """IVF×PQ composition (operators/similarity.topk_ivfpq): coarse
    buckets cut WHICH candidates are scored, PQ codes cut WHAT each one
    costs — the standard billion-vector recipe, here as one map-only
    encode pass + broadcast LUT scan + one top-k window. Same shared
    deterministic kernels as ann_pq_topk, so the VALUES twin
    hash-matches; recall composes the two stages' pytest bounds."""
    from cdrc_semantic_search_spark.operators.similarity import (
        topk_ivfpq,
        train_centroids,
        train_pq_codebooks,
    )

    sample, q, c = _ann_fixture(spark, sf_dir)
    cent = train_centroids(sample, n_centroids=16, seed=42)
    books = train_pq_codebooks(sample, m=8, k=16, seed=42)
    out = topk_ivfpq(spark, q, c, cent, books, k=5, n_probe=4)
    return out.select("q_id", "c_id", F.round("score", 6).alias("score"), "rank")


@register("ann_pq_rerank", value_oracles.lazy("ann_pq_rerank"))
def ann_pq_rerank(spark, sf_dir):
    """Coarse-to-fine retrieval (operators/similarity.topk_pq_rerank):
    PQ-ADC shortlists 20 candidates per query over the compressed
    corpus, only their true vectors are fetched and re-ranked with the
    exact cosine — the production pattern that recovers what
    quantization loses while touching |q|·20 float vectors instead of
    the corpus. Output scores are EXACT cosines."""
    from cdrc_semantic_search_spark.operators.similarity import (
        topk_pq_rerank,
        train_pq_codebooks,
    )

    sample, q, c = _ann_fixture(spark, sf_dir)
    books = train_pq_codebooks(sample, m=8, k=16, seed=42)
    out = topk_pq_rerank(spark, q, c, books, k=5, shortlist=20)
    return out.select("q_id", "c_id", F.round("score", 6).alias("score"), "rank")


@register("ann_ivfpq_residual", value_oracles.lazy("ann_ivfpq_residual"))
def ann_ivfpq_residual(spark, sf_dir):
    """Residual IVF×PQ (operators/similarity.topk_ivfpq residual=True):
    the true FAISS-IVFPQ formulation — PQ codes quantize (unit − coarse
    centroid), scoring adds the analytic q·centroid term back. The same
    code budget then captures within-cluster detail plain PQ discards
    (recall comparison pinned in test_ivf). All kernels shared with the
    twin; VALUES oracle hash-exact."""
    from cdrc_semantic_search_spark.operators.similarity import (
        topk_ivfpq,
        train_centroids,
        train_residual_codebooks,
    )

    sample, q, c = _ann_fixture(spark, sf_dir)
    cent = train_centroids(sample, n_centroids=16, seed=42)
    books = train_residual_codebooks(sample, cent, m=8, k=16, seed=42)
    out = topk_ivfpq(spark, q, c, cent, books, k=5, n_probe=4, residual=True)
    return out.select("q_id", "c_id", F.round("score", 6).alias("score"), "rank")


# same oracle as ann_pq_topk ON PURPOSE: querying the materialized,
# upsert-maintained index must reproduce the direct-path result
# bit-for-bit (the kg_edges_incremental pattern, applied to the vector
# index lifecycle)
@register("ann_pq_index_roundtrip", value_oracles.lazy("ann_pq_topk"))
def ann_pq_index_roundtrip(spark, sf_dir):
    """Vector-index lifecycle (reference K1 upsert analog): codebooks +
    codes materialize through the catalog from HALF the corpus, the
    other half arrives later via upsert_pq_index (merge_upsert on id,
    codebooks fixed), and the query runs against the STORED index — the
    float corpus is never reopened at query time. Must hash EQUAL to
    ann_pq_topk's direct-path oracle."""
    import os
    import tempfile

    from cdrc_semantic_search_spark.operators.similarity import (
        materialize_pq_index,
        topk_pq_adc_index,
        train_pq_codebooks,
        upsert_pq_index,
    )
    from cdrc_semantic_search_spark.sources.catalog import ParquetTableCatalog

    sample, q, c = _ann_fixture(spark, sf_dir)
    books = train_pq_codebooks(sample, m=8, k=16, seed=42)
    # pid-suffixed path: repeated harness evaluations in one process
    # reuse it (create_or_replace overwrites), while CONCURRENT runs
    # (pytest + check_entry) can't race on each other's swap windows
    root = os.path.join(
        tempfile.gettempdir(), f"pq_index_fixture_{os.getuid()}_{os.getpid()}"
    )
    catalog = ParquetTableCatalog(root)
    materialize_pq_index(spark, catalog, c.filter("c_id < 250"), books)
    upsert_pq_index(spark, catalog, c.filter("c_id >= 250"))
    out = topk_pq_adc_index(spark, q, catalog, k=5)
    return out.select("q_id", "c_id", F.round("score", 6).alias("score"), "rank")


def _sssp_oracle_sql(rounds: int = 6) -> str:
    """Unrolled Bellman-Ford oracle: each MATERIALIZED round merges the
    previous distances with one relaxation over the symmetrized weighted
    edge list (plain CTEs would inline 2^rounds-fold — the graph_kcore
    lesson). Integral weights keep every path sum exact in double."""
    parts = [
        """
    WITH e0 AS MATERIALIZED (
        SELECT l_suppkey AS s, 1000 + l_partkey % 100 AS t,
               MIN(l_quantity) AS w
        FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2
    ),
    e AS MATERIALIZED (
        SELECT s AS src, t AS dst, w FROM e0
        UNION ALL
        SELECT t, s, w FROM e0
    ),
    d0 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS DOUBLE) AS dist)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    d{i} AS MATERIALIZED (
        SELECT id, MIN(dist) AS dist FROM (
            SELECT id, dist FROM d{i - 1}
            UNION ALL
            SELECT e.dst AS id, d{i - 1}.dist + e.w AS dist
            FROM d{i - 1} JOIN e ON e.src = d{i - 1}.id
        ) GROUP BY id
    )"""
        )
    parts.append(f"""
    SELECT id, dist FROM d{rounds}
    """)
    return "".join(parts)


@register("graph_sssp_weighted", _sssp_oracle_sql)
def graph_sssp_weighted(spark, sf_dir):
    """Weighted single-source shortest paths (fixed-round Bellman-Ford,
    operators/graph.sssp_weighted) from supplier 1 over the symmetrized
    supplier↔bucket graph, edges weighted by cheapest quantity — the
    weighted companion of graph_bfs_distances. Path sums of integral
    weights are exact in double, so the unrolled oracle matches
    bit-for-bit with no rounding."""
    from cdrc_semantic_search_spark.operators.graph import sssp_weighted

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    fwd = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
        F.col("l_quantity").alias("w"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    sources = spark.range(1, 2).select(F.col("id"))
    return sssp_weighted(edges, sources, n_rounds=6)


def _lpa_cte_parts(rounds: int = 4) -> list[str]:
    """Shared unrolled-LPA CTE prefix (ends at l{rounds}) for the
    graph_label_prop and graph_modularity oracles."""
    parts = [
        """
    WITH raw AS MATERIALIZED (
        SELECT DISTINCT l_suppkey AS s, 1000 + l_partkey % 100 AS d
        FROM lineitem WHERE l_orderkey < 300
    ),
    e AS MATERIALIZED (
        SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
        FROM raw WHERE s <> d
    ),
    sym AS MATERIALIZED (
        SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT v AS id, v AS label FROM sym)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    c{i} AS MATERIALIZED (
        SELECT id, label, COUNT(*) AS c FROM (
            SELECT sym.v AS id, l{i - 1}.label AS label
            FROM sym JOIN l{i - 1} ON l{i - 1}.id = sym.n
            UNION ALL
            SELECT id, label FROM l{i - 1}
        ) GROUP BY id, label
    ),
    l{i} AS MATERIALIZED (
        SELECT id, label FROM (
            SELECT id, label, ROW_NUMBER() OVER (
                PARTITION BY id ORDER BY c DESC, label ASC
            ) AS rn FROM c{i}
        ) WHERE rn = 1
    )"""
        )
    return parts


def _lpa_oracle_sql(rounds: int = 4) -> str:
    """Unrolled synchronous label-propagation oracle: each MATERIALIZED
    round re-derives every vertex's label as the most frequent label
    among neighbors + self, ties to the smallest label (ROW_NUMBER
    mirrors the Spark max-of-(count,-label) aggregation exactly —
    integer-only, no float hazard)."""
    parts = _lpa_cte_parts(rounds)
    parts.append(f"""
    SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label FROM l{rounds}
    """)
    return "".join(parts)


def _modularity_oracle_sql(rounds: int = 4) -> str:
    """Modularity of the unrolled-LPA labeling. The per-community sums
    are INTEGER aggregates (intra edge count, Σ d_c²) so the only float
    ops are the final two divisions and one subtraction — the identical
    expression the Spark operator evaluates, bit-for-bit."""
    parts = _lpa_cte_parts(rounds)
    parts.append(f"""
    , lab AS MATERIALIZED (SELECT id, label FROM l{rounds}),
    tagged AS (
        SELECT e.a, e.b, la.label AS la, lb.label AS lb
        FROM e JOIN lab la ON la.id = e.a JOIN lab lb ON lb.id = e.b
    ),
    mi AS (
        SELECT COUNT(*) AS m_edges,
               COUNT(*) FILTER (WHERE la = lb) AS intra_edges
        FROM tagged
    ),
    deg AS (SELECT v, COUNT(*) AS deg FROM sym GROUP BY v),
    dc AS (
        SELECT lab.label, SUM(deg.deg) AS d_c
        FROM deg JOIN lab ON lab.id = deg.v GROUP BY lab.label
    ),
    ss AS (SELECT SUM(d_c * d_c) AS sum_deg_sq FROM dc)
    SELECT CAST(m_edges AS BIGINT) AS m_edges,
           CAST(intra_edges AS BIGINT) AS intra_edges,
           CAST(sum_deg_sq AS BIGINT) AS sum_deg_sq,
           CAST(intra_edges AS DOUBLE) / CAST(m_edges AS DOUBLE)
           - CAST(sum_deg_sq AS DOUBLE)
             / (4.0 * CAST(m_edges AS DOUBLE) * CAST(m_edges AS DOUBLE))
             AS modularity
    FROM mi, ss
    """)
    return "".join(parts)


def _conductance_oracle_sql(rounds: int = 4) -> str:
    """Per-community conductance of the unrolled-LPA labeling: integer
    cut/volume aggregates, one guarded exact division (cut 0 → 0.0)."""
    parts = _lpa_cte_parts(rounds)
    parts.append(f"""
    , lab AS MATERIALIZED (SELECT id, label FROM l{rounds}),
    tagged AS (
        SELECT la.label AS la, lb.label AS lb
        FROM e JOIN lab la ON la.id = e.a JOIN lab lb ON lb.id = e.b
    ),
    cuts AS (
        SELECT label, COUNT(*) AS cut_edges FROM (
            SELECT la AS label FROM tagged WHERE la <> lb
            UNION ALL SELECT lb FROM tagged WHERE la <> lb
        ) GROUP BY label
    ),
    deg AS (SELECT v, COUNT(*) AS deg FROM sym GROUP BY v),
    vol AS (
        SELECT lab.label, COUNT(*) AS n_nodes, SUM(deg.deg) AS volume
        FROM deg JOIN lab ON lab.id = deg.v GROUP BY lab.label
    ),
    tot AS (SELECT SUM(volume) AS total_vol FROM vol)
    SELECT CAST(vol.label AS BIGINT) AS label,
           CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(COALESCE(cut_edges, 0) AS BIGINT) AS cut_edges,
           CAST(volume AS BIGINT) AS volume,
           CASE WHEN COALESCE(cut_edges, 0) = 0 THEN 0.0
                ELSE CAST(COALESCE(cut_edges, 0) AS DOUBLE)
                     / CAST(LEAST(volume, (SELECT total_vol FROM tot) - volume) AS DOUBLE)
           END AS conductance
    FROM vol LEFT JOIN cuts ON cuts.label = vol.label
    """)
    return "".join(parts)


@register("graph_conductance", _conductance_oracle_sql)
def graph_conductance(spark, sf_dir):
    """Per-community conductance of the 4-round LPA labeling
    (operators/graph.community_conductance) — the per-community quality
    gate beside global modularity; integer cut/volume, guarded exact
    division, no rounding."""
    from cdrc_semantic_search_spark.operators.graph import (
        community_conductance,
        label_propagation,
    )

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    labels = label_propagation(edges, n_rounds=4)
    out = community_conductance(edges, labels)
    return out.select(
        F.col("label").cast("long").alias("label"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("cut_edges").cast("long").alias("cut_edges"),
        F.col("volume").cast("long").alias("volume"),
        "conductance",
    )


@register("graph_label_prop", _lpa_oracle_sql)
def graph_label_prop(spark, sf_dir):
    """Label-propagation communities (operators/graph.label_propagation,
    4 synchronous rounds, self-vote, min-label ties) over the same
    supplier↔bucket graph as graph_pagerank — the entity-community
    assignment stage downstream of kg_edges materialization. The oracle
    unrolls the four rounds as MATERIALIZED CTEs (the graph_kcore
    inlining lesson) and is exact: the update rule is integer-only."""
    from cdrc_semantic_search_spark.operators.graph import label_propagation

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    out = label_propagation(edges, n_rounds=4)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("label").cast("long").alias("label"),
    )


@register("graph_modularity", _modularity_oracle_sql)
def graph_modularity(spark, sf_dir):
    """Newman modularity of the 4-round LPA labeling over the
    supplier↔bucket graph (operators/graph.modularity) — the quality
    gate for community output. Integer aggregates hoisted so the float
    tail is three exact ops; no rounding needed."""
    from cdrc_semantic_search_spark.operators.graph import (
        label_propagation,
        modularity,
    )

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    labels = label_propagation(edges, n_rounds=4)
    return modularity(edges, labels)


_BURST_ORACLE_SQL = """
    WITH daily AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    win AS (
        SELECT key, day, cnt,
               COALESCE(SUM(cnt) OVER (
                   PARTITION BY key ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING
               ), 0) AS sum_prev,
               COUNT(*) OVER (
                   PARTITION BY key ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING
               ) AS n_prev
        FROM daily
    )
    SELECT key, day, CAST(cnt AS BIGINT) AS cnt,
           CAST(sum_prev AS BIGINT) AS sum_prev,
           (n_prev = 3 AND cnt * 2 * 3 > 3 * sum_prev) AS is_burst
    FROM win
"""


@register("t5_burst_detection", _BURST_ORACLE_SQL)
def t5_burst_detection(spark, sf_dir):
    """Daily activity-burst detection per event_type
    (operators/temporal.burst_detection): a day bursts when its count
    beats 1.5× the mean of the 3 preceding observed days — integer-only
    inequality (cnt·2·3 > 3·sum_prev), cold-start days are explicit
    is_burst = false rows. The temporal-KG consumer: edge-activity spike
    detection on kg_edges_temporal."""
    from cdrc_semantic_search_spark.operators.temporal import burst_detection

    ev = load(spark, sf_dir, "events")
    return burst_detection(ev, "event_type", trailing=3, num=3, den=2)


@register("graph_random_walks", value_oracles.lazy("graph_random_walks"))
def graph_random_walks(spark, sf_dir):
    """Deterministic truncated random walks (operators/graph.random_walks;
    hash-routed next hops over sorted adjacency — node2vec/DeepWalk
    corpus generation for graph-embedding training). Oracle: pure-Python
    twin sharing zlib.crc32 == Spark F.crc32 (java.util.zip.CRC32, same
    polynomial) over the sf0.01 parquet; candidate adjacency re-derived
    independently (dict-of-sorted-lists, never the distributed join)."""
    from cdrc_semantic_search_spark.operators.graph import random_walks

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 200")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    out = random_walks(edges, walk_length=4, n_walks=2, seed=42)
    return out.select(
        "walk_id", F.col("step").cast("int").alias("step"),
        F.col("node").cast("long").alias("node"),
    )


@register("graph_walk_pairs", value_oracles.lazy("graph_walk_pairs"))
def graph_walk_pairs(spark, sf_dir):
    """Skip-gram positive pairs from the deterministic random walks
    (operators/graph.walk_skipgram_pairs, window=2) — the
    embedding-training positives the walk corpus exists to produce.
    Oracle: plain-dict pair counting over the shared walk-simulation
    twin."""
    from cdrc_semantic_search_spark.operators.graph import (
        random_walks,
        walk_skipgram_pairs,
    )

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 200")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    walks = random_walks(edges, walk_length=4, n_walks=2, seed=42)
    out = walk_skipgram_pairs(walks, window=2)
    return out.select(
        F.col("center").cast("long").alias("center"),
        F.col("context").cast("long").alias("context"),
        "n_pairs",
    )


@register(
    "t6_decayed_activity",
    """
    WITH daily AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT MAX(day) AS as_of FROM daily),
    aged AS (
        SELECT key, cnt,
               LEAST(datediff('day', day, (SELECT as_of FROM mx)), 25) AS age
        FROM daily
    )
    SELECT key,
           SUM(cnt * POWER(2.0, -(CAST(age AS DOUBLE) / 1.0))) AS decayed,
           CAST(SUM(cnt) AS BIGINT) AS total_cnt
    FROM aged GROUP BY key
    """,
)
def t6_decayed_activity(spark, sf_dir):
    """Exponentially time-decayed activity per event_type
    (operators/temporal.decayed_activity, halflife 1 day, age cap 25):
    the recency-weighted importance signal. The double SUM is pinned
    WITHOUT rounding — dyadic terms keep every partial sum exact (see
    the operator's float-discipline note), so engine/partitioning
    summation order cannot move a bit."""
    from cdrc_semantic_search_spark.operators.temporal import decayed_activity

    ev = load(spark, sf_dir, "events")
    return decayed_activity(ev, "event_type", halflife_days=1, max_age_days=25)


@register(
    "graph_sparsify_topk",
    """
    WITH e AS (
        SELECT LEAST(l_suppkey, 1000 + l_partkey % 100) AS src,
               GREATEST(l_suppkey, 1000 + l_partkey % 100) AS dst,
               COUNT(*) AS weight
        FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2
    ),
    bi AS (
        SELECT src AS s, dst AS d, weight AS w FROM e
        UNION ALL SELECT dst, src, weight FROM e
    ),
    r AS (
        SELECT s, d, w,
               ROW_NUMBER() OVER (PARTITION BY s ORDER BY w DESC, d ASC) AS rn
        FROM bi
    )
    SELECT DISTINCT CAST(LEAST(s, d) AS BIGINT) AS src,
           CAST(GREATEST(s, d) AS BIGINT) AS dst,
           CAST(w AS BIGINT) AS weight
    FROM r WHERE rn <= 3
    """,
)
def graph_sparsify_topk(spark, sf_dir):
    """Top-3 strongest incident edges per node
    (operators/graph.sparsify_topk_edges) over the weighted
    supplier↔bucket graph — the degree-bounding pre-processing for
    wedge-join algorithms; edge survives if either endpoint ranks it."""
    from cdrc_semantic_search_spark.operators.graph import sparsify_topk_edges

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = (
        li.select(
            F.least(
                F.col("l_suppkey"), F.lit(1000) + F.col("l_partkey") % 100
            ).alias("src"),
            F.greatest(
                F.col("l_suppkey"), F.lit(1000) + F.col("l_partkey") % 100
            ).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    out = sparsify_topk_edges(edges, k=3)
    return out.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("weight").cast("long").alias("weight"),
    )


@register(
    "graph_clustering_coeff",
    """
    WITH raw AS (
        SELECT DISTINCT l_suppkey AS s, 1000 + l_partkey % 100 AS d
        FROM lineitem WHERE l_orderkey < 200
    ),
    e AS (
        SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
        FROM raw WHERE s <> d
    ),
    tris AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
        SELECT x AS id FROM tris
        UNION ALL SELECT y FROM tris
        UNION ALL SELECT z FROM tris
    ),
    t AS (SELECT id, COUNT(*) AS tri_cnt FROM corners GROUP BY id),
    deg AS (
        SELECT id, COUNT(*) AS deg FROM (
            SELECT a AS id FROM e UNION ALL SELECT b FROM e
        ) GROUP BY id
    )
    SELECT CAST(deg.id AS BIGINT) AS id, CAST(deg AS BIGINT) AS deg,
           CAST(COALESCE(tri_cnt, 0) AS BIGINT) AS tri_cnt,
           CASE WHEN deg < 2 THEN 0.0
                ELSE (2.0 * CAST(COALESCE(tri_cnt, 0) AS DOUBLE))
                     / CAST(deg * (deg - 1) AS DOUBLE) END AS coeff
    FROM deg LEFT JOIN t ON t.id = deg.id
    """,
)
def graph_clustering_coeff(spark, sf_dir):
    """Per-vertex local clustering coefficients
    (operators/graph.clustering_coefficients) over the supplier↔bucket
    graph — int/int division in double, bit-agreed across engines, no
    rounding."""
    from cdrc_semantic_search_spark.operators.graph import (
        clustering_coefficients,
    )

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 200")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    out = clustering_coefficients(edges)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("deg").cast("long").alias("deg"),
        F.col("tri_cnt").cast("long").alias("tri_cnt"),
        "coeff",
    )


@register(
    "kg_cluster_representatives",
    value_oracles.lazy("kg_cluster_representatives"),
)
def kg_cluster_representatives(spark, sf_dir):
    """Display-form selection per surface cluster
    (KGPipeline.cluster_representatives): most-mentioned member wins,
    ties to the smallest surface — the consumer-facing canonicalization
    output on top of surface_clusters. Twin: shared derivation with the
    kg_canon_quality twin + plain-dict argmax."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities)
    men = pipe.mentions(tdf)
    return pipe.cluster_representatives(men)


@register("kg_meta_paths", value_oracles.lazy("kg_meta_paths"))
def kg_meta_paths(spark, sf_dir):
    """Typed relation-composition statistics: every composable
    a→[p1]→mid→[p2]→c path (a≠c) rolled up per (pred1, pred2) —
    n_paths, Σ w1·w2, distinct endpoint pairs. The schema-discovery
    query KG curators run to find which predicate compositions carry
    signal (e.g. uses_tool ∘ located_in). One midpoint-keyed self-join
    of the typed edge rollup + one aggregation whose key space is
    |preds|² — broadcast-small at any corpus size."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities)
    e = pipe.kg_edges(pipe.triples(tdf)).select(
        F.col("subj_entity_id").alias("a"),
        F.col("pred"),
        F.col("obj_entity_id").alias("b"),
        F.col("weight").alias("w"),
    )
    e1 = e.select(
        F.col("a"), F.col("pred").alias("pred1"),
        F.col("b").alias("mid"), F.col("w").alias("w1"),
    )
    e2 = e.select(
        F.col("a").alias("mid"), F.col("pred").alias("pred2"),
        F.col("b").alias("c"), F.col("w").alias("w2"),
    )
    return (
        e1.join(e2, "mid")
        .filter(F.col("a") != F.col("c"))
        .groupBy("pred1", "pred2")
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.sum(F.col("w1") * F.col("w2")).alias("path_weight"),
            F.count_distinct(F.col("a"), F.col("c")).alias("n_pairs"),
        )
    )


@register("kg_graph_diff", value_oracles.lazy("kg_graph_diff"))
def kg_graph_diff(spark, sf_dir):
    """Temporal graph diff (KGPipeline.edge_diff): the fixture's triples
    split at 2026-05-01 into two observation windows, per-window
    kg_edges rollups full-outer diffed — added/removed/changed/stable
    relations, the re-canon/trend trigger feed. Twin: plain-dict window
    rollups + diff."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities)
    tr = pipe.triples(tdf)
    split = F.lit("2026-05-01").cast("timestamp")
    old = pipe.kg_edges(tr.filter(F.col("ts") < split)).drop(
        "first_ts", "last_ts"
    )
    new = pipe.kg_edges(tr.filter(F.col("ts") >= split)).drop(
        "first_ts", "last_ts"
    )
    return KGPipeline.edge_diff(old, new)


@register("kg_entity_communities", value_oracles.lazy("kg_entity_communities"))
def kg_entity_communities(spark, sf_dir):
    """The KG consumer of label propagation end-to-end:
    KGPipeline.entity_communities over the fixture's materialized
    kg_edges (STRING entity ids — the path the numeric graph_label_prop
    oracle can't exercise), permissive modularity floor. Twin: plain-dict
    synchronous LPA over the fixture-triples edge rollup."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities)
    edges = pipe.kg_edges(pipe.triples(tdf))
    return pipe.entity_communities(edges, min_modularity=-1.0)


@register(
    "kg_entity_communities_weighted",
    value_oracles.lazy("kg_entity_communities_weighted"),
)
def kg_entity_communities_weighted(spark, sf_dir):
    """Weight-proportional LPA over the fixture's kg_edges
    (entity_communities(weighted=True)): a 40-triple relation out-votes
    a 1-triple one. Twin: plain-dict weighted LPA over per-pair triple
    multiplicities."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities)
    edges = pipe.kg_edges(pipe.triples(tdf))
    return pipe.entity_communities(edges, weighted=True)


@register("graph_node2vec_walks", value_oracles.lazy("graph_node2vec_walks"))
def graph_node2vec_walks(spark, sf_dir):
    """Second-order biased walks (operators/graph.random_walks_node2vec,
    p=2 q=3: backtracking discouraged, BFS-leaning) over the same
    supplier↔bucket graph as graph_random_walks — weighted hop selection
    is a single Catalyst aggregate over integer pq-scaled weights, no
    UDF. Oracle: pure-Python twin over the shared adjacency + crc32."""
    from cdrc_semantic_search_spark.operators.graph import (
        random_walks_node2vec,
    )

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 200")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    out = random_walks_node2vec(
        edges, walk_length=4, n_walks=1, seed=42, p=2, q=3
    )
    return out.select(
        "walk_id", F.col("step").cast("int").alias("step"),
        F.col("node").cast("long").alias("node"),
    )


@register("kg_triples_fixture", value_oracles.lazy("kg_triples_fixture"))
def kg_triples_fixture(spark, sf_dir):
    """The KG pipeline end-to-end on the deterministic transcript fixture.
    The oracle is a VALUES literal from the single-process pure-pandas
    pipeline twin (oracle.oracle_triples — the same twin the P/R parity
    pytest pins in tests/test_kg_parity.py)."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    # score rounds to 4 decimals: the fused op links unknown surfaces in
    # per-Arrow-batch encoder calls, so the blend score carries float32
    # batch-composition noise (~1e-7) vs the one-at-a-time oracle; every
    # fixture score sits ≥1.8e-6 from a 4-digit rounding boundary
    # (value_oracles.py), so the rounded value is partition-invariant
    return pipe.triples(tdf).drop("ts").withColumn("score", F.round("score", 4))


@register("kg_edges_fixture", value_oracles.lazy("kg_edges_fixture"))
def kg_edges_fixture(spark, sf_dir):
    """kg_edges materialization over the fixture; VALUES oracle from the
    pandas rollup of the pure-Python triple twin."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    return pipe.kg_edges(pipe.triples(tdf)).drop("first_ts", "last_ts")


# same oracle as kg_edges_fixture ON PURPOSE: incremental maintenance must
# reproduce the full rebuild bit-for-bit
@register("kg_edges_incremental", value_oracles.lazy("kg_edges_fixture"))
def kg_edges_incremental(spark, sf_dir):
    """Incremental edge maintenance (KGPipeline.merge_edge_deltas): the
    fixture's conversations split into two batches, each rolled up
    separately, then MERGED — must hash EQUAL to the full-rebuild oracle
    (merge(kg_edges(A), kg_edges(B)) ≡ kg_edges(A ∪ B)), which is the
    invariant per-partition ledger commits rely on at 10^12 turns."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    # no persist: the harness collects after return, so a cached frame
    # could never be unpersisted; at fixture scale recomputing the two
    # batch filters is cheaper than pinning blocks for the whole run
    triples = pipe.triples(tdf)
    batch_a = pipe.kg_edges(triples.filter(F.col("conv_id") < "conv_000020"))
    batch_b = pipe.kg_edges(triples.filter(F.col("conv_id") >= "conv_000020"))
    return KGPipeline.merge_edge_deltas(batch_a, batch_b).drop(
        "first_ts", "last_ts"
    )


@register("kg_nodes_fixture", value_oracles.lazy("kg_nodes_fixture"))
def kg_nodes_fixture(spark, sf_dir):
    """Node table over the deterministic fixture (KGPipeline.kg_nodes):
    entity dim enriched with linked-mention counts; oracle is the
    single-process extract+link twin (plans/value_oracles.py)."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    return pipe.kg_nodes(pipe.mentions(tdf))


# same oracle as kg_nodes_fixture ON PURPOSE (see kg_edges_incremental)
@register("kg_nodes_incremental", value_oracles.lazy("kg_nodes_fixture"))
def kg_nodes_incremental(spark, sf_dir):
    """Incremental node maintenance (KGPipeline.merge_node_deltas): the
    fixture's conversations split into two batches, each counted
    separately, then MERGED — must hash EQUAL to the full-rebuild
    oracle.  Note both batches carry the full dim with zero counts for
    unseen entities, so the merge must not double anything."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    mentions = pipe.mentions(tdf)  # no persist — see kg_edges_incremental
    batch_a = pipe.kg_nodes(mentions.filter(F.col("conv_id") < "conv_000020"))
    batch_b = pipe.kg_nodes(mentions.filter(F.col("conv_id") >= "conv_000020"))
    return KGPipeline.merge_node_deltas(batch_a, batch_b)


# same oracle as kg_edges_fixture ON PURPOSE: the ledgered path must
# reproduce the full rebuild
@register("kg_edges_ledgered", value_oracles.lazy("kg_edges_fixture"))
def kg_edges_ledgered(spark, sf_dir):
    """End-to-end resumable materialization: run_partitioned(with_graph)
    commits per-bucket triples + edge/node DELTAS through the ledger into
    a fresh temp catalog, then compacted_edges() recovers the edge table
    merge-on-read — must hash EQUAL to the full-rebuild oracle.  This is
    the log-structured commit path 10^12-turn runs use: no
    read-modify-write, every bucket an idempotent partition overwrite."""
    import os
    import tempfile

    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import PipelineSettings, Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline
    from cdrc_semantic_search_spark.sources.catalog import ParquetTableCatalog

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    settings = Settings(pipeline=PipelineSettings(num_buckets=4))
    pipe = KGPipeline(spark, fx.entities, settings)
    # fixed per-user path, not mkdtemp: repeated harness evaluations reuse
    # the committed catalog (the ledger makes the second run a no-op
    # resume) instead of leaking a fresh directory per call
    root = os.path.join(
        tempfile.gettempdir(), f"kg_ledger_fixture_{os.getuid()}"
    )
    catalog = ParquetTableCatalog(root)
    pipe.run_partitioned(tdf, catalog, source_snapshot="seed42", with_graph=True)
    return KGPipeline.compacted_edges(spark, catalog).drop("first_ts", "last_ts")


@register("kg_edges_temporal", value_oracles.lazy("kg_edges_temporal"))
def kg_edges_temporal(spark, sf_dir):
    """Temporal knowledge graph: the kg_edges rollup WITH its activity
    span ([first_ts, last_ts] per edge) — the validity-interval view that
    time-scoped queries ("what did we know about X in March") filter on.
    Twin recomputes the span from the pure-Python triples joined back to
    turn timestamps; TIMESTAMP literals ride the VALUES oracle."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    return pipe.kg_edges(pipe.triples(tdf))


@register("kg_two_hop_paths", value_oracles.lazy("kg_two_hop_paths"))
def kg_two_hop_paths(spark, sf_dir):
    """Relation composition over the fixture graph: collapse edges across
    predicates to (subj, obj, w), then one self-join on the midpoint
    gives every a→mid→c path (a≠c) with n_mids distinct midpoints and
    path_weight = Σ w1·w2 — the 2-hop reachability query KG consumers
    run for indirect-association mining. One key-partitioned self-join +
    one aggregation; the twin enumerates paths in plain dicts."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    # no persist: the harness collects after return (see kg_edges_incremental);
    # at fixture scale recomputing the collapsed edge agg per join branch is
    # cheaper than pinning blocks for the whole run
    e = (
        pipe.triples(tdf)
        .groupBy(
            F.col("subj_entity_id").alias("a"),
            F.col("obj_entity_id").alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    e1 = e.select(F.col("a"), F.col("c").alias("mid"), F.col("w").alias("w1"))
    e2 = e.select(F.col("a").alias("mid"), F.col("c"), F.col("w").alias("w2"))
    return (
        e1.join(e2, "mid")
        .filter(F.col("a") != F.col("c"))
        .groupBy(
            F.col("a").alias("subj_entity_id"),
            F.col("c").alias("obj_entity_id"),
        )
        .agg(
            F.countDistinct("mid").alias("n_mids"),
            F.sum(F.col("w1") * F.col("w2")).alias("path_weight"),
        )
    )


@register(
    "doc_mad_outliers",
    """
    WITH med AS (
        SELECT source, quantile_cont(n_chars, 0.5) AS med_chars
        FROM documents GROUP BY source
    ),
    dev AS (
        SELECT d.source, d.n_chars, m.med_chars,
               ABS(d.n_chars - m.med_chars) AS absdev
        FROM documents d JOIN med m ON m.source = d.source
    ),
    mad AS (
        SELECT source, quantile_cont(absdev, 0.5) AS mad_chars FROM dev GROUP BY source
    )
    SELECT dev.source,
           CAST(ANY_VALUE(dev.med_chars) AS DOUBLE) AS med_chars,
           CAST(ANY_VALUE(mad.mad_chars) AS DOUBLE) AS mad_chars,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dev.absdev > 3 * mad.mad_chars
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON mad.source = dev.source
    GROUP BY dev.source
    """,
)
def doc_mad_outliers(spark, sf_dir):
    """Robust outlier detection for curation: per-source median absolute
    deviation of document length, counting docs beyond 3·MAD — the
    outlier filter that, unlike mean±k·σ, a single 100 MB page dump
    cannot drag. Two grouped exact percentiles (interpolated identically
    by Spark's percentile and DuckDB's quantile_cont — the a7 invariant)
    with broadcast joins back onto the facts; every derived double is
    exact (integer inputs, .5 interpolation), so no rounding is needed."""
    d = load(spark, sf_dir, "documents").select("source", "n_chars")
    med = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med_chars")
    )
    dev = d.join(F.broadcast(med), "source").withColumn(
        "absdev", F.abs(F.col("n_chars") - F.col("med_chars"))
    )
    mad = dev.groupBy("source").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad_chars")
    )
    return (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.first("med_chars").alias("med_chars"),
            F.first("mad_chars").alias("mad_chars"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("absdev") > 3 * F.col("mad_chars"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@register(
    "t4_gap_fill_locf",
    """
    WITH obs AS (
        SELECT user_id AS g, date_trunc('hour', ts) AS bucket_ts,
               MAX(value) AS value
        FROM events WHERE user_id < 3 AND value IS NOT NULL
        GROUP BY 1, 2
    ),
    spans AS (
        SELECT g, MIN(bucket_ts) AS t0, MAX(bucket_ts) AS t1 FROM obs GROUP BY g
    ),
    spine AS (
        SELECT g, UNNEST(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket_ts
        FROM spans
    )
    SELECT s.g AS user_id, CAST(s.bucket_ts AS TIMESTAMP) AS bucket_ts,
           LAST_VALUE(o.value IGNORE NULLS) OVER (
               PARTITION BY s.g ORDER BY s.bucket_ts ROWS UNBOUNDED PRECEDING
           ) AS value,
           o.value IS NULL AS is_gap
    FROM spine s LEFT JOIN obs o ON o.g = s.g AND o.bucket_ts = s.bucket_ts
    """,
)
def t4_gap_fill_locf(spark, sf_dir):
    """Time-series gap fill (operators/temporal.gap_fill_locf): one row
    per hour per user over each user's observed span, gaps filled by
    last-observation-carried-forward — the resample step between raw
    event tables and anything that assumes a regular grid. The bucket
    spine is generated DISTRIBUTED (sequence+explode per group), never a
    driver loop; oracle uses generate_series + IGNORE NULLS window."""
    from cdrc_semantic_search_spark.operators.temporal import gap_fill_locf

    ev = load(spark, sf_dir, "events").filter(
        (F.col("user_id") < 3) & F.col("value").isNotNull()
    )
    return gap_fill_locf(ev, "user_id", "ts", "value", unit="1 hour")


@register(
    "skew3_salted_join",
    """
    WITH dim AS (
        SELECT event_type,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 8) AS DOUBLE)
                   / COUNT(value) AS type_avg
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, dim.type_avg
    FROM events e JOIN dim ON dim.event_type = e.event_type
    WHERE e.event_id < 5000
    """,
)
def skew3_salted_join(spark, sf_dir):
    """Salted hot-key equi-join (operators/assembly.salted_join): every
    event key is hot (a handful of event types over the whole fact
    table), so the fact side salts into 8 lanes keyed on event_id and
    the dim side replicates — identical rows to the plain join (the
    oracle), but the exchange spreads each hot key over 8 reducers.
    The manual fallback where AQE skew-join can't rewrite (stream-static)
    or the dim side is too big to broadcast."""
    from cdrc_semantic_search_spark.operators.assembly import salted_join

    ev = load(spark, sf_dir, "events")
    # exact cross-engine mean: decimal sum → ROUND(,8) → double ÷ count
    # (a double AVG's value depends on accumulation order)
    dim = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            (
                F.round(F.sum(F.col("value").cast("decimal(18,4)")), 8)
                .cast("double")
                / F.count("value")
            ).alias("type_avg")
        )
    )
    fact = ev.filter(F.col("event_id") < 5000).select("event_id", "event_type")
    out = salted_join(fact, dim, ["event_type"], 8, ["event_id"])
    return out.select("event_id", "event_type", "type_avg")


@register("kg_type_assortativity", value_oracles.lazy("kg_type_assortativity"))
def kg_type_assortativity(spark, sf_dir):
    """Type-pair mixing matrix: triple counts per (subject type, object
    type) — the schema-level health check on an extracted KG (a spike in
    tool→tool 'located_in' edges means the linker drifted). Two broadcast
    joins of the tiny entity dim onto the triples, one aggregation."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    triples = pipe.triples(tdf)
    edim = spark.createDataFrame(
        fx.entities[["entity_id", "entity_type"]]
    )
    st = edim.select(
        F.col("entity_id").alias("subj_entity_id"),
        F.col("entity_type").alias("subj_type"),
    )
    ot = edim.select(
        F.col("entity_id").alias("obj_entity_id"),
        F.col("entity_type").alias("obj_type"),
    )
    return (
        triples.join(F.broadcast(st), "subj_entity_id")
        .join(F.broadcast(ot), "obj_entity_id")
        .groupBy("subj_type", "obj_type")
        .agg(F.count(F.lit(1)).alias("n_triples"))
    )


@register("kg_negative_samples", value_oracles.lazy("kg_negative_samples"))
def kg_negative_samples(spark, sf_dir):
    """Deterministic TransE-style negative sampling over the fixture edge
    set (operators/graph.negative_sample_edges): 2 md5-picked corrupted
    tails per positive edge, broadcast-joined against the sorted entity
    dim and anti-joined against the positives — the KG-embedding training
    data generator, reproducible on any engine."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.operators.graph import negative_sample_edges
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    edges = pipe.kg_edges(pipe.triples(tdf)).select(
        "subj_entity_id", "pred", "obj_entity_id"
    )
    ents = sorted(fx.entities.entity_id.tolist())
    edim = spark.createDataFrame(
        [(i, e) for i, e in enumerate(ents)], "idx long, entity_id string"
    )
    out = negative_sample_edges(edges, edim, k=2)
    return out.select(
        "subj_entity_id",
        "pred",
        "obj_entity_id",
        F.col("neg_idx").cast("int").alias("neg_idx"),
    )


@register("kg_type_constraints", value_oracles.lazy("kg_type_constraints"))
def kg_type_constraints(spark, sf_dir):
    """Predicate domain/range validation over the fixture KG
    (plans/kg_pipeline.edge_type_profile): every observed (pred,
    subj_type, obj_type) combination counted and flagged against the
    DEFAULT_EDGE_SCHEMA ontology ('*' wildcards; broadcast — the one
    genuinely bounded dim). Violations are real: the fixture ontology
    excludes tool→tool uses_tool and non-data derived_from endpoints.
    Oracle: pandas twin over the pure-Python triple twin + the SAME
    schema constant."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import (
        DEFAULT_EDGE_SCHEMA,
        KGPipeline,
        edge_type_profile,
    )

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    edges = pipe.kg_edges(pipe.triples(tdf))
    nodes = spark.createDataFrame(
        fx.entities[["entity_id", "entity_type"]]
    )
    schema = spark.createDataFrame(
        DEFAULT_EDGE_SCHEMA, "pred string, subj_type string, obj_type string"
    )
    return edge_type_profile(edges, nodes, schema)


@register("kg_canon_quality", value_oracles.lazy("kg_canon_quality"))
def kg_canon_quality(spark, sf_dir):
    """Pair-counting precision/recall of the pipeline's surface
    canonicalization against the gold entity labels riding on the
    surface_clusters frame (operators/canonicalize.
    clustering_pair_quality) — the distributed form of the north rule's
    P/R gate, runnable as a data-quality probe on every compaction.
    Oracle: a pure-Python twin that re-derives the clusters from the
    shared specification kernels (encode_texts + lsh_planes/
    lsh_bucket_matrix + fold-cosine + union-find) and counts pairs with
    exact integers."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.operators.canonicalize import (
        clustering_pair_quality,
    )
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    return clustering_pair_quality(pipe.surface_clusters(pipe.mentions(tdf)))


# =====================================================================
# §2.10 incremental / event-time
# =====================================================================

@register(
    "i1_windowed_counts",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def i1_windowed_counts(spark, sf_dir):
    """Tumbling event-time windows (the batch twin of the streaming
    watermarked aggregation, streaming/incremental.py)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )


@register(
    "a4_first_pick",
    """
    SELECT o_custkey AS c_custkey,
           CAST(MIN(o_orderdate) AS DATE) AS first_order_date,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
    """,
)
def a4_first_pick(spark, sf_dir):
    """A4 first-element pick (datastore.py:33) done right: explicit min
    over the group, not 'first row of the file'."""
    o = load(spark, sf_dir, "orders").filter("o_custkey < 200")
    return o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.min("o_orderdate").cast("date").alias("first_order_date"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


# =====================================================================
# late additions: F1 / F6 / J5 / W4
# =====================================================================

@register(
    "f1_regexp_extract_all",
    """
    SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(regexp_extract_all(text, '\\b(s[a-z]+)', 1)) AS w
        FROM documents
    ) GROUP BY w ORDER BY n DESC, word ASC
    """,
)
def f1_regexp_extract_all(spark, sf_dir):
    """F1 regex findall (cdrc_logs.py:7-10,22-25): all s-words, counted."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(r"\b(s[a-z]+)"), F.lit(1))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
    )


@register(
    "f6_notes_template",
    """
    SELECT doc_id,
           source || E'\\n\\n' || regexp_replace('<i>' || text || '</i>', '<[^<]+?>', '', 'g') AS notes_doc
    FROM documents WHERE doc_id < 50
    """,
)
def f6_notes_template(spark, sf_dir):
    """F6/K4 notes-document synthesis (query_api.py:90-94): title + blank
    line + HTML-stripped body."""
    d = load(spark, sf_dir, "documents").filter("doc_id < 50")
    wrapped = F.concat(F.lit("<i>"), F.col("text"), F.lit("</i>"))
    return d.select("doc_id", T.notes_document(F.col("source"), wrapped).alias("notes_doc"))


@register(
    "j5_zip_join",
    """
    WITH p AS (
        SELECT ROW_NUMBER() OVER (ORDER BY p_retailprice DESC, p_partkey ASC) AS rk, p_name
        FROM part
    ),
    s AS (
        SELECT ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS rk, s_name
        FROM supplier
    )
    SELECT CAST(p.rk AS INT) AS rank, p.p_name, s.s_name
    FROM p JOIN s ON p.rk = s.rk WHERE p.rk <= 10
    """,
)
def j5_zip_join(spark, sf_dir):
    """J5 positional zip join (streamlit_app.py:43) done safely: explicit
    row_number on both sides + equi-join, never partition order."""
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    wp = Window.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    ws = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    pr = p.select(F.row_number().over(wp).alias("rank"), "p_name").filter("rank <= 10")
    sr = s.select(F.row_number().over(ws).alias("rank"), "s_name").filter("rank <= 10")
    return pr.join(sr, "rank").select("rank", "p_name", "s_name")


@register(
    "w4_head_n",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
)
def w4_head_n(spark, sf_dir):
    """W4 head(100) (evaluation.py:43) — deterministic via explicit order
    + unique-key tie-break before the limit."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@register(
    "a1b_ordered_assembly",
    """
    SELECT user_id,
           string_agg(event_type, '|' ORDER BY ts, event_id) AS conversation_text,
           CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM events WHERE user_id < 20
    GROUP BY user_id
    """,
)
def a1b_ordered_assembly(spark, sf_dir):
    """W5/A1 conversation assembly: the two-stage order-stable concat
    (operators/assembly.assemble_conversations) cross-checked against
    SQL string_agg with explicit ORDER BY — proving the blocked concat
    equals a global ordered concat."""
    from cdrc_semantic_search_spark.operators.assembly import assemble_conversations

    e = load(spark, sf_dir, "events").filter("user_id < 20")
    # map the event stream onto the (conv_id, turn_idx, text, ts) shape;
    # event_id is unique so it is a valid stable ordering key
    turns = e.select(
        F.col("user_id").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("event_type").alias("text"),
        "ts",
    )
    out = assemble_conversations(turns, sep="|", block_size=64)
    return out.select(
        F.col("conv_id").alias("user_id"),
        "conversation_text",
        F.col("n_turns").alias("n_turns"),
    )


@register("ann_ivf_topk", value_oracles.lazy("ann_ivf_topk"))
def ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed approximate top-k. Deterministic end-to-end (seeded
    k-means on a DETERMINISTIC sample — vec_id < 256 sorted, not
    limit(), whose row pick depends on partitioning), so the oracle is a
    VALUES literal from the pure-NumPy twin; recall bounds are separately
    pinned in tests/test_ivf.py and the exact twin is j3_topk_cosine."""
    from cdrc_semantic_search_spark.operators.similarity import (
        topk_cosine_ivf,
        train_centroids,
    )

    sample, q, c = _ann_fixture(spark, sf_dir)
    cent = train_centroids(sample, n_centroids=16, seed=42)
    out = topk_cosine_ivf(spark, q, c, cent, k=5, n_probe=4)
    return out.select("q_id", "c_id", F.round("score", 6).alias("score"), "rank")


@register("dedup_semantic_keep", value_oracles.lazy("dedup_semantic_keep"))
def dedup_semantic_keep(spark, sf_dir):
    """SemDeDup-style semantic dedup: k-means clusters + within-cluster
    greedy cosine pruning (operators/dedup.semantic_dedup_keep). Fully
    deterministic (seeded centroids on the shared _ann_fixture sample,
    ascending-id greedy order, shared float64 keep kernel), so the
    oracle is the pure-NumPy twin's VALUES literal. The 0.35 threshold
    is fixture-calibrated — the synthetic embeddings are near-orthogonal
    (max off-diagonal cosine ≈ 0.51); real encoder output uses ~0.95."""
    from cdrc_semantic_search_spark.operators.dedup import semantic_dedup_keep
    from cdrc_semantic_search_spark.operators.similarity import train_centroids

    sample, _q, _c = _ann_fixture(spark, sf_dir)
    cent = train_centroids(sample, n_centroids=16, seed=42)
    e = load(spark, sf_dir, "embeddings")
    return semantic_dedup_keep(
        spark, e, "vec_id", "embedding", cent, threshold=0.35
    )


@register(
    "q18_large_volume_customer",
    """
    SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS orderdate,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 120
    )
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape: group-having subquery membership (left-semi join
    against an aggregated key set). Deliberately coexists with
    :func:`q18_large_volume_customers` (plural): this variant pins the
    two-table semi-join kernel in isolation (orders+lineitem only, no
    dimension), while the plural entry is the full three-table Q18 with
    the customer rollup — two registry rows, two distinct plan shapes."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 120)
        .select("l_orderkey")
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_dec_sum("l_quantity", "total_qty"))
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "total_qty",
        )
    )


@register(
    "a7_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS qty_p25
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a7_percentiles(spark, sf_dir):
    """Exact continuous percentiles per group — Spark's `percentile`
    (exact, sort-based) ≡ DuckDB quantile_cont: both linearly interpolate
    at rank p·(n−1). The scale path swaps in approx_percentile (t-digest,
    map-side mergeable) when an exact sort per group is too expensive."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("qty_p25"),
    )


@register(
    "a8_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def a8_rollup(spark, sf_dir):
    """Hierarchical subtotals via ROLLUP — grand total + per-flag +
    per-(flag,status) in ONE pass (Spark expands grouping sets inside the
    same partial/final aggregation; no extra scans or self-unions)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _dec_sum("l_quantity", "sum_qty"),
    )


@register(
    "a9_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a9_pivot(spark, sf_dir):
    """Pivot (dict→columns transpose, the F12 idiom as real columns):
    groupBy().pivot() with EXPLICIT pivot values — at scale the implicit
    form pays a distinct-values job first; naming them keeps it one pass."""
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"))
    )
    return out.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) / 7.0, 4) AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')
      AND l.l_quantity < 0.2 * (
          SELECT AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average gates
    the outer row). Decorrelated the way Catalyst would: the per-partkey
    average aggregates to ≤|filtered part| rows and joins back — no
    FORCED broadcast, because both the filtered part list and the
    per-partkey average table are SF-proportional; AQE broadcasts them
    while they fit and falls back to a shuffle join at 100× instead of
    OOMing the driver. l_quantity is integral, so the double AVG is
    exact and the 0.2·avg comparison is engine-independent."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13"))
        .select("p_partkey")
    )
    avg_q = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    return (
        li.join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(15,4))
                   * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_rev, 4) AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: revenue-per-supplier view + scalar-MAX subquery
    (the reference's "best match wins" idiom at table scale). The max is
    aggregated to a 1-row frame and broadcast back — no global window
    (a Window.partitionBy() over everything would funnel the whole
    revenue table through one task). Ties all survive, as in SQL;
    the equality compares exact decimals, so it cannot drift."""
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,4)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(8,4)"))
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    sup = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["max_rev"])
        .join(sup, sup["s_suppkey"] == rev["supplier_no"])
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 4).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(15,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(8,4)))), 4)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-AND predicates spanning both join sides.
    The single-side conjuncts are factored out so they PUSH DOWN below
    the join (part: brand ∈ the three brands ∧ size ≤ 15; lineitem:
    quantity ≤ 30) — Catalyst does this constraint propagation for the
    common conjuncts; stating the residual OR once post-join keeps the
    semantics. The part side shrinks to a broadcast after its filter."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    j = li.filter((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)).join(
        p, F.col("p_partkey") == F.col("l_partkey")
    )
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 5)
         & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#34")
           & (F.col("l_quantity") >= 20))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,4)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(8,4)"))
            ),
            4,
        )
        .cast("double")
        .alias("revenue")
    )


_SQL_SURFACE = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM {orders} o
    WHERE EXISTS (
        SELECT 1 FROM {lineitem} l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    GROUP BY o_orderpriority
"""


@register("sql_surface_exists", _SQL_SURFACE.format(orders="orders", lineitem="lineitem"))
def sql_surface_exists(spark, sf_dir):
    """The engine's SQL FRONT-END (spark.sql over temp views) running a
    TPC-H Q4-shaped EXISTS aggregation — the identical ANSI string DuckDB
    executes, proving both of the brief's declared API surfaces
    (DataFrame AND spark.sql) produce oracle-exact results. Catalyst
    rewrites EXISTS to the same left-semi join the DataFrame queries
    build by hand."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__sql_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("__sql_lineitem")
    return spark.sql(
        _SQL_SURFACE.format(orders="__sql_orders", lineitem="__sql_lineitem")
    )


@register(
    "q22_dormant_rich_customers",
    """
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS ab
        FROM customer WHERE c_acctbal > 0.0 AND c_nationkey < 10
    )
    SELECT c_nationkey AS nation, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey < 10
      AND c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
)
def q22_dormant_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: global scalar-subquery threshold (above-average
    balance, computed as exact-decimal-sum / count so the cutoff is
    engine-independent) + NOT EXISTS anti-join (customers without urgent
    orders — every synthetic customer has SOME order). The scalar joins
    in as a broadcast cross join, not a driver collect. Deliberately
    coexists with :func:`q22_global_sales_opportunity`: this variant
    pins the division-free decimal threshold against a FILTERED customer
    subset with a plain anti-join, while the other is the full Q22 with
    the country-code grouping — two registry rows, two plan shapes."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 10)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("ab")
        )
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    dormant = rich.join(
        o, rich["c_custkey"] == o["o_custkey"], "left_anti"
    )
    return dormant.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).cast("long").alias("numcust"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 4)
        .cast("double")
        .alias("totacctbal"),
    )


@register(
    "q21_lone_returner_suppliers",
    """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q21_lone_returner_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: the multi-EXISTS idiom — suppliers who were the
    ONLY returner ('R') in a finished multi-supplier order. EXISTS →
    left-semi join, NOT EXISTS → left-anti join, both hash-joined on
    l_orderkey with the suppkey inequality as a residual condition (the
    testdata has no commit/receipt dates, so returnflag stands in for
    'kept waiting'). The two fact-fact joins share the l_orderkey
    partitioning, so the exchange is reused across semi and anti."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")
    cand = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    # orders is a fact table — it joins on the same l_orderkey partitioning
    # (exchange reuse); supplier is SF-proportional, so AQE decides the
    # join strategy rather than a forced broadcast
    return (
        cand.join(o, F.col("l1.l_orderkey") == o["o_orderkey"])
        .join(s, F.col("l1.l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


@register(
    "q4_order_priority_checking",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority_checking(spark, sf_dir):
    """TPC-H Q4 shape: date-windowed orders having at least one late line,
    counted per priority. The testdata carries no commit/receipt dates
    (same adaptation note as q21), so "late" is l_shipdate more than 60
    days after o_orderdate — a CORRELATED exists whose predicate spans
    both tables, compiled to one left-semi hash join on l_orderkey with
    the date comparison as a residual condition. Orders is filtered
    before the join (pushed to the scan); lineitem never aggregates —
    the semi join stops at first match per order."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.date_add(o["o_orderdate"], 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_priority_by_returnflag",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_by_returnflag(spark, sf_dir):
    """TPC-H Q12 shape: fact-fact join + conditional-count pivot per
    group (the testdata has no l_shipmode, so l_returnflag is the
    grouping stand-in — the idiom under test is the CASE-WHEN partial
    aggregation, which collapses each map partition to 3 rows before the
    exchange). The l_shipdate range filter is pushed to the lineitem
    scan; orders carries only (o_orderkey, o_orderpriority) through the
    join (column pruning)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count distribution — the OUTER
    join + two-level aggregation idiom (customers with zero qualifying
    orders must survive as c_count = 0). The testdata has no o_comment,
    so the "not like %special%requests%" exclusion is stood in by an
    o_orderpriority predicate — same plan shape: the filter lives in the
    JOIN condition, not a WHERE (a WHERE would silently turn the outer
    join inner and drop zero-order customers).

    Scale: the left join shuffles both sides on the customer key (both
    SF-proportional — no broadcast hint, AQE decides); the first
    aggregation rides the same partitioning (no extra exchange), and the
    second groups on c_count, whose key space is tiny (map-side combine
    collapses each task to ~dozens of rows)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = c.join(
        o,
        (c["c_custkey"] == o["o_custkey"])
        & (o["o_orderpriority"] != "4-NOT SPECIFIED"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("long").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "q14_promo_revenue",
    """
    SELECT ROUND(
        100.0 * CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l_discount AS DECIMAL(8,4))
                     ELSE CAST(0 AS DECIMAL(15,4)) * CAST(0 AS DECIMAL(8,4)) END), 4) AS DOUBLE)
        / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE),
        6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-03-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promotion revenue share — conditional aggregation over
    a fact-dim join, reduced to ONE output row. Both sums are exact
    decimal products (factor-wise casts, module doc), rounded to 4
    before the double division; the ratio itself is one IEEE division of
    two identical doubles, so both engines agree bit-for-bit.

    Scale: the l_shipdate range filter is pushed to the lineitem scan;
    part carries only (p_partkey, p_type) through the join (column
    pruning) and is dimension-sized relative to lineitem — AQE
    broadcast-decides (no forced hint; part grows with SF). The CASE
    sums partial-aggregate map-side to a single row per task."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-03-01")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    price_d = F.col("l_extendedprice").cast("decimal(15,4)")
    disc_d = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    zero_d = F.lit(0).cast("decimal(15,4)") * F.lit(0).cast("decimal(8,4)")
    promo = F.when(F.col("p_type").startswith("PROMO"), price_d * disc_d).otherwise(
        zero_d
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.round(F.sum(promo), 4).cast("double")
                / F.round(F.sum(price_d * disc_d), 4).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_name, c.c_custkey, o.o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
    )
    GROUP BY c_name, c.c_custkey, o.o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18: large-volume customers — the HAVING-subquery-as-
    semi-join idiom. The inner aggregation groups lineitem on its OWN
    key (one exchange, map-side partials), keeps only order keys whose
    quantity sum exceeds the threshold (a tiny survivor set), and that
    set semi-joins orders before the re-join with lineitem for the
    final rollup. Quantity sums are exact decimal (integral doubles in
    the data, but the cast removes any float-accumulation hazard).

    Scale: the survivor set is threshold-selective (46 of 30k orders at
    sf0.01) — AQE broadcast-decides the semi and subsequent joins at
    runtime; no forced hints since every table here is SF-proportional.
    lineitem is scanned twice by design (TPC-H's own shape); the second
    scan only reads (l_orderkey, l_quantity) after pruning."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty_d = F.col("l_quantity").cast("decimal(18,4)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_d).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big["l_orderkey"], "left_semi"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty_d).cast("double").alias("sum_qty"))
    )


@register(
    "q22_global_sales_opportunity",
    """
    WITH pos AS (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s, COUNT(*) AS cnt
        FROM customer WHERE c_acctbal > 0.0
    ),
    urgent AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    )
    SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) * pos.cnt > pos.s
      AND NOT EXISTS (SELECT 1 FROM urgent u WHERE u.o_custkey = c.c_custkey)
    GROUP BY c_nationkey % 5
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no matching
    order, grouped by country code — the scalar-subquery-threshold +
    NOT-EXISTS anti-join idiom. Adaptations for this testdata (no
    c_phone; every customer has ≥1 order, so the classic "never ordered"
    predicate is empty): cntrycode = c_nationkey % 5, and the anti-join
    excludes customers with an URGENT order instead of any order.

    Exactness: "above average" compares c_acctbal·cnt > Σ(acctbal) in
    EXACT decimal — a decimal-integer cross-multiplication instead of
    dividing (decimal division scale rules differ between engines, and
    a double average is accumulation-order-dependent; the product form
    is order-independent and bit-exact in both).

    Scale: the (sum, count) scalar is a 1-row broadcast cross join (the
    allowed hint class — scalar aggregates, never SF-proportional
    tables); the anti side is a DISTINCT projection of orders, shuffled
    on its own key; customer is scanned once."""
    c = load(spark, sf_dir, "customer")
    bal_d = F.col("c_acctbal").cast("decimal(18,4)")
    pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.sum(bal_d).alias("s"), F.count(F.lit(1)).alias("cnt"))
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    kept = (
        c.crossJoin(F.broadcast(pos))
        .filter(bal_d * F.col("cnt") > F.col("s"))
        .join(urgent, c["c_custkey"] == urgent["o_custkey"], "left_anti")
    )
    return kept.groupBy(
        (F.col("c_nationkey") % 5).cast("int").alias("cntrycode")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("numcust"),
        F.sum(bal_d).cast("double").alias("totacctbal"),
    )


@register(
    "i2_sliding_windows",
    """
    WITH w AS (
        SELECT event_type, unnest([
            make_timestamp(CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)*1000000),
            make_timestamp((CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)-3600)*1000000)
        ]) AS window_start
        FROM events
    )
    SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM w GROUP BY 1, 2
    """,
)
def i2_sliding_windows(spark, sf_dir):
    """Sliding event-time windows (2 h wide, 1 h slide): each event lands
    in exactly window/slide = 2 epoch-aligned windows. The oracle expands
    the two member windows per event explicitly, proving Spark's
    F.window(slide) assignment bucket-for-bucket. In streaming the same
    expression runs under a watermark (tumbling twin: i1_windowed_counts)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "ev_retention_cohorts",
    """
    WITH first_seen AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    )
    SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
           CAST((epoch(a.day) - epoch(f.cohort_day)) / 86400 AS INT) AS days_since,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
)
def ev_retention_cohorts(spark, sf_dir):
    """Retention cohort matrix: users grouped by first-seen day, activity
    counted per days-since-cohort — the classic growth-analytics rollup.
    Two aggregations plus one join on user_id (shared partitioning);
    day-truncation and the epoch difference are engine-identical, so the
    full matrix hash-matches."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    act = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    days_since = (
        (F.unix_timestamp("day") - F.unix_timestamp("cohort_day")) / 86400
    ).cast("int")
    return (
        act.join(first, "user_id")
        .groupBy("cohort_day", days_since.alias("days_since"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


@register(
    "t1_asof_enrich",
    """
    WITH purch AS (
        SELECT user_id, ts, MAX(value) AS value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           ROUND(p.value, 6) AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def t1_asof_enrich(spark, sf_dir):
    """As-of join (backward, inclusive): each click gets the user's most
    recent purchase value at-or-before its timestamp, NULL when none.
    The operator (operators/temporal.asof_join_backward) is a union +
    single window pass — one shuffle on user_id, no inequality-join
    candidate explosion; the oracle is DuckDB's native ASOF LEFT JOIN."""
    from cdrc_semantic_search_spark.operators.temporal import asof_join_backward

    ev = load(spark, sf_dir, "events")
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))  # dedupe equal-ts snapshots
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_backward(
        clicks, purch, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"],
    )
    return out.select(
        "event_id", "user_id", F.round("value", 6).alias("last_purchase_value")
    )


@register(
    "t2_range_join",
    """
    WITH ranges AS (
        SELECT event_id AS range_id, ts AS r_start, ts + INTERVAL 6 HOUR AS r_end
        FROM events WHERE event_type = 'signup' AND event_id < 400
    ),
    counts AS (
        SELECT r.range_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events e JOIN ranges r
          ON e.ts >= r.r_start AND e.ts < r.r_end
        GROUP BY r.range_id
    )
    SELECT ranges.range_id, CAST(COALESCE(counts.n, 0) AS BIGINT) AS n_facts
    FROM ranges LEFT JOIN counts USING (range_id)
    """,
)
def t2_range_join(spark, sf_dir):
    """Range (interval) join: count events inside each 6-hour window
    opened by an early signup — one row per range, empty windows included
    with 0. The range side broadcasts (ranges ≪ facts), so the fact table
    is scanned once with a nested-loop probe per range — the plan you
    want when the interval table is dimension-sized
    (operators/temporal.range_join_count)."""
    from cdrc_semantic_search_spark.operators.temporal import range_join_count

    ev = load(spark, sf_dir, "events")
    ranges = (
        ev.filter((F.col("event_type") == "signup") & (F.col("event_id") < 400))
        .select(
            F.col("event_id").alias("range_id"),
            F.col("ts").alias("r_start"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("r_end"),
        )
    )
    return range_join_count(
        ev, ranges, fact_ts="ts", range_start="r_start", range_end="r_end",
        range_keys=["range_id"],
    )


@register(
    "t3_hypertable_rollup",
    """
    SELECT '1 hour' AS level, date_trunc('hour', ts) AS bucket_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT '1 day', date_trunc('day', ts), event_type,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
    FROM events GROUP BY 2, 3
    """,
)
def t3_hypertable_rollup(spark, sf_dir):
    """Hypertable-style cascading rollup (continuous-aggregate analog):
    hourly buckets aggregate the raw rows once; the daily level
    re-aggregates the HOURLY table (sums of exact decimal sums). The
    oracle aggregates each level directly from raw — hash equality IS the
    cascade-correctness invariant."""
    from cdrc_semantic_search_spark.operators.temporal import hypertable_rollup

    ev = load(spark, sf_dir, "events")
    return hypertable_rollup(
        ev, ts_col="ts", group_cols=["event_type"], agg_col="value",
        levels=("1 hour", "1 day"),
    )


@register(
    "ev_funnel_stages",
    """
    WITH s1 AS (
        SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'signup') AS t1
        FROM events GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'view' AND s1.t1 IS NOT NULL
          AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 48 HOUR
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 48 HOUR
        GROUP BY e.user_id
    )
    SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS funnel_stage,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    WHERE t1 IS NOT NULL
    GROUP BY 1
    """,
)
def ev_funnel_stages(spark, sf_dir):
    """Ordered funnel analysis (signup → view within 48 h → purchase
    within 48 h of the view): how many users reach each stage, honoring
    event-time order + conversion windows. Staged conditional
    aggregation — each stage table is one groupBy over the events
    filtered by the previous stage's timestamp; all three joins share
    the user_id partitioning (exchange reuse), no window over the full
    event stream needed."""
    ev = load(spark, sf_dir, "events")
    win = F.expr("INTERVAL 48 HOURS")
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1")
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1.filter(F.col("t1").isNotNull()), "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .otherwise(1)
        .cast("int")
    )
    return (
        s1.filter(F.col("t1").isNotNull())
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@register(
    "w9_rank_family",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM lineitem WHERE l_orderkey < 100
    WINDOW w AS (
        PARTITION BY l_returnflag
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    )
    """,
)
def w9_rank_family(spark, sf_dir):
    """The full rank-function family over one reusable window spec (ties
    broken by unique keys so every engine agrees): rank, dense_rank,
    ntile, percent_rank, cume_dist — one shuffle, all five functions ride
    the same sort."""
    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 100")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "dedup_levenshtein",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_dist
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 300) a
    JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 300) b
      ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def dedup_levenshtein(spark, sf_dir):
    """Edit-distance fuzzy matching — the dedup family's string-metric
    member (record-linkage style): customer-name pairs within Levenshtein
    distance 2, small-n all-pairs twin. The scale path blocks candidates
    first (shared prefix / length band / LSH buckets) and only then pays
    the O(len²) distance — same pattern as the other dedup operators."""
    c = load(spark, sf_dir, "customer").filter("c_custkey < 300").select(
        "c_custkey", "c_name"
    )
    a = c.select(F.col("c_custkey").alias("id_a"), F.col("c_name").alias("na"))
    b = c.select(F.col("c_custkey").alias("id_b"), F.col("c_name").alias("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("na", "nb").cast("int"))
        .filter(F.col("edit_dist") <= 2)
        .select("id_a", "id_b", "edit_dist")
    )


@register(
    "dedup_levenshtein_blocked",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_dist
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 2000) a
    JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 2000) b
      ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def dedup_levenshtein_blocked(spark, sf_dir):
    """The edit-distance SCALE path (closes r4 "What's wrong #3"): the
    PassJoin-style segment-blocked operator whose candidate generation
    is COMPLETE (operators/dedup.levenshtein_pairs_blocked docstring has
    the pigeonhole argument), so its output is oracled against the plain
    all-pairs DuckDB twin and hash-matches exactly. The templated
    Customer#NNNNNNNNN names are the blocking-hostile case — shared
    prefixes concentrate candidates into few buckets — which the exact
    re-check absorbs at this bounded slice and the bucket cap guards at
    scale."""
    from cdrc_semantic_search_spark.operators.dedup import (
        levenshtein_pairs_blocked,
    )

    c = load(spark, sf_dir, "customer").filter("c_custkey < 2000").select(
        "c_custkey", "c_name"
    )
    return levenshtein_pairs_blocked(c, "c_custkey", "c_name", max_dist=2)


@register(
    "w7_sessionization",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events WHERE user_id < 30
    ),
    sessions AS (
        SELECT user_id, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def w7_sessionization(spark, sf_dir):
    """Batch sessionization (gap > 30 min starts a session): lag → marker
    → running-sum session id — the batch twin of the stateful streaming
    operator (streaming/sessionize.py), exactly oracle-checkable."""
    e = load(spark, sf_dir, "events").filter("user_id < 30")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet; go NTZ → TZ (session is UTC) → epoch
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = marked.withColumn(
        "session_id", F.sum("new_session").over(wsum).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )


@register(
    "w8_session_window",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE user_id < 30
    ),
    s AS (
        -- event_id in the cumulative ORDER BY: equal-ts peers would otherwise
        -- sort nondeterministically and could merge rows into the wrong
        -- session at SFs with duplicate (user_id, ts)
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def w8_session_window(spark, sf_dir):
    """Spark's NATIVE session_window aggregation cross-checked against the
    classic lag/cumsum SQL formulation (w7's shape with the >= gap rule —
    session_window's window end is exclusive, so a gap of exactly the
    timeout starts a new session). One aggregation, no window function on
    the Spark side; the same expression works under a watermark in
    streaming."""
    ev = load(spark, sf_dir, "events").filter("user_id < 30")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "curation_pipeline",
    f"""
    WITH t AS (
        SELECT doc_id, n_chars, {_SQL_TOKS} AS toks FROM documents WHERE doc_id < 300
    ),
    dup_pairs AS (
        SELECT b.doc_id AS loser
        FROM (SELECT doc_id, list_distinct(toks) AS s FROM t) a
        JOIN (SELECT doc_id, list_distinct(toks) AS s FROM t) b
          ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ),
    survivors AS (
        SELECT * FROM t WHERE doc_id NOT IN (SELECT loser FROM dup_pairs)
    ),
    kept AS (
        SELECT doc_id FROM survivors
        WHERE len(toks) BETWEEN 20 AND 200
          AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3
    )
    SELECT CASE WHEN CAST(('0x' || substr(md5('split|' || doc_id), 1, 8)) AS UBIGINT) % 10000 < 8000 THEN 'train'
                WHEN CAST(('0x' || substr(md5('split|' || doc_id), 1, 8)) AS UBIGINT) % 10000 < 9000 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM kept GROUP BY 1
    """,
)
def curation_pipeline(spark, sf_dir):
    """The composed training-data curation flow END-TO-END in one plan:
    token-Jaccard near-dup removal (inverted-index candidates, losers =
    higher id of each ≥0.8 pair) → quality gate (token band + lexical
    diversity) → deterministic train/val/test split → per-split counts.
    Every stage is the registry operator it reuses (ngram_jaccard_pairs
    k=1, curation predicates, deterministic_split), and the whole
    composition still hash-matches one DuckDB query."""
    from cdrc_semantic_search_spark.operators.dedup import ngram_jaccard_pairs
    from cdrc_semantic_search_spark.operators.split import deterministic_split
    from cdrc_semantic_search_spark.operators.text_analysis import quality_gate

    d = load(spark, sf_dir, "documents").filter("doc_id < 300")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", k=1, threshold=0.8)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = d.join(losers, "doc_id", "left_anti")
    kept = quality_gate(survivors, "text")
    return (
        deterministic_split(kept, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@register(
    "curation_filter",
    f"""
    SELECT doc_id, n_chars FROM (
        SELECT doc_id, n_chars,
               len(toks) AS n_tokens,
               CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) ELSE 0.0 END AS distinct_ratio
        FROM (SELECT doc_id, n_chars, {_SQL_TOKS} AS toks FROM documents)
    ) WHERE n_tokens BETWEEN 20 AND 200 AND distinct_ratio >= 0.3
    """,
)
def curation_filter(spark, sf_dir):
    """Training-data curation filter: token-count band + lexical-diversity
    floor — the composed quality gate a 100-TB pipeline scans with
    (predicates stay Catalyst-side; nothing leaves the scan+filter).
    Shared implementation: operators/text_analysis.quality_gate (also the
    dedup→gate→split stage in curation_pipeline)."""
    from cdrc_semantic_search_spark.operators.text_analysis import quality_gate

    d = load(spark, sf_dir, "documents")
    return quality_gate(d, "text").select("doc_id", "n_chars")


# =====================================================================
# transcript analytics (payload-native ops over (conv_id, turn_idx,
# role, text, tool, ts) — operators/transcript_analytics.py)
# =====================================================================

def _fixture_turns(spark):
    """The deterministic transcript fixture as a Spark frame — the same
    (seed=42, 40 convs, 100 entities) instance the kg_* queries pin, so
    the VALUES twins in value_oracles.py derive from identical rows."""
    from cdrc_semantic_search_spark import fixtures

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    return tdf


@register("tr_tool_transitions", value_oracles.lazy("tr_tool_transitions"))
def tr_tool_transitions(spark, sf_dir):
    """Tool-call sequence mining: counts of consecutive tool invocations
    within a conversation (lag window over the stable (conv_id,
    turn_idx) order — the W5 ordering contract). Oracle: pure-Python
    twin over the same fixture rows."""
    from cdrc_semantic_search_spark.operators.transcript_analytics import (
        tool_transition_counts,
    )

    return tool_transition_counts(_fixture_turns(spark))


@register("tr_turn_latency", value_oracles.lazy("tr_turn_latency"))
def tr_turn_latency(spark, sf_dir):
    """Per-role response-latency rollup: integer-second gap to the
    previous turn of the conversation, summed/maxed per responding role
    (integer-exact — no float summation-order hazard in the hash)."""
    from cdrc_semantic_search_spark.operators.transcript_analytics import (
        turn_latency_stats,
    )

    return turn_latency_stats(_fixture_turns(spark))


@register("tr_role_balance", value_oracles.lazy("tr_role_balance"))
def tr_role_balance(spark, sf_dir):
    """Per-conversation role mix (user/assistant/tool turn counts) — the
    first-line corpus health metric; one map-side-combined groupBy on
    the table's natural key."""
    from cdrc_semantic_search_spark.operators.transcript_analytics import (
        role_balance,
    )

    return role_balance(_fixture_turns(spark))


@register("tr_qa_pairs", value_oracles.lazy("tr_qa_pairs"))
def tr_qa_pairs(spark, sf_dir):
    """Question-answer pair mining: user turns containing '?' answered by
    the immediately following assistant turn, with character lengths —
    one lead window over the stable (conv_id, turn_idx) order, no join.
    Oracle: pure-Python twin over the same fixture rows."""
    from cdrc_semantic_search_spark.operators.transcript_analytics import (
        qa_pair_mining,
    )

    return qa_pair_mining(_fixture_turns(spark))


@register("tr_qa_overlap", value_oracles.lazy("tr_qa_overlap"))
def tr_qa_overlap(spark, sf_dir):
    """Question↔answer token-set Jaccard
    (transcript_analytics.qa_lexical_overlap): the answer-relevance
    proxy over mined QA pairs — shared Catalyst tokens kernel,
    array_intersect/union sets, guarded int/int division. Oracle:
    pure-Python twin via the pinned _tokens kernel."""
    from cdrc_semantic_search_spark.operators.transcript_analytics import (
        qa_lexical_overlap,
    )

    return qa_lexical_overlap(_fixture_turns(spark))


@register("tr_topic_segments", value_oracles.lazy("tr_topic_segments"))
def tr_topic_segments(spark, sf_dir):
    """Embedding-drift conversation segmentation (transcript_analytics.
    topic_segments): encode each turn (Arrow-batched pandas UDF), lag
    the vector over the stable conversation order, start a segment where
    fold-cosine to the previous turn drops below τ=0.15 — integer-only
    output (conv_id, turn_idx, segment_id). Oracle: pure-Python twin
    over the shared encode + fold-cosine kernels."""
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.encoder import make_encoder_udf
    from cdrc_semantic_search_spark.operators.transcript_analytics import (
        topic_segments,
    )

    enc = Settings().encoder
    encode = make_encoder_udf(dim=enc.embed_dim, seed=enc.seed, ngram=enc.ngram)
    turns = _fixture_turns(spark).withColumn(
        "vec", encode(F.coalesce(F.col("text"), F.lit("")))
    )
    return topic_segments(turns, "vec", threshold=0.15)


@register("tr_salient_turns", value_oracles.lazy("tr_salient_turns"))
def tr_salient_turns(spark, sf_dir):
    """Top-3 most-central turns per conversation (transcript_analytics.
    salient_turns): fold-cosine to the DECIMAL-exact conversation
    centroid, ties broken by earliest turn — the representative-turn
    selector for summarization/labeling. Oracle: pure-Python twin
    replicating the decimal centroid (BigDecimal.valueOf cast
    semantics) and the exact fold score."""
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.encoder import make_encoder_udf
    from cdrc_semantic_search_spark.operators.transcript_analytics import (
        salient_turns,
    )

    enc = Settings().encoder
    encode = make_encoder_udf(dim=enc.embed_dim, seed=enc.seed, ngram=enc.ngram)
    turns = _fixture_turns(spark).withColumn(
        "vec", encode(F.coalesce(F.col("text"), F.lit("")))
    )
    return salient_turns(turns, "vec", top_k=3)


@register("tr_tool_retries", value_oracles.lazy("tr_tool_retries"))
def tr_tool_retries(spark, sf_dir):
    """Tool retry-run mining: maximal runs (length ≥ 2) of consecutive
    same-tool calls in each conversation's tool-call sequence — the
    run-length-encode-by-window idiom (lag boundary flag + running sum
    run id, one shuffle)."""
    from cdrc_semantic_search_spark.operators.transcript_analytics import (
        tool_retry_runs,
    )

    return tool_retry_runs(_fixture_turns(spark))


# =====================================================================
# PII redaction (operators/text_analysis.redact_pii)
# =====================================================================

# the documents fixture carries no PII, so the query plants a
# deterministic contact line derived from doc_id — identically in the
# Spark plan and the DuckDB oracle — and redacts it. || of the SAME
# expressions keeps both sides byte-identical pre-redaction.
_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@example.com via "
    "https://ex.org/d/' || CAST(doc_id AS VARCHAR) || ' or +1 415 555 '"
    " || CAST(doc_id AS VARCHAR) || ' host 10.0.' || "
    "CAST(doc_id % 200 AS VARCHAR) || '.7'"
)


def _pii_oracle_sql() -> str:
    """Generate the ta_redact_pii oracle from PII_PATTERNS itself — one
    source of truth, so editing/reordering the policy list can never
    leave the oracle silently testing a different policy. DuckDB's
    standard single-quote strings pass backslashes through literally,
    so the raw patterns land in RE2 unchanged (only quotes escape)."""
    from cdrc_semantic_search_spark.operators.text_analysis import PII_PATTERNS

    sql = (
        "WITH d AS (\n"
        f"    SELECT doc_id, text || {_PII_SUFFIX_SQL} AS t0\n"
        "    FROM documents WHERE doc_id < 200\n)"
    )
    cols: list[str] = []
    for i, (label, pat, repl) in enumerate(PII_PATTERNS, start=1):
        p = pat.replace("'", "''")
        carried = ", ".join(["doc_id"] + cols)
        src = "d" if i == 1 else f"s{i - 1}"
        sql += (
            f",\ns{i} AS (\n"
            f"    SELECT {carried},\n"
            f"        CAST(len(regexp_extract_all(t{i - 1}, '{p}')) AS INTEGER) AS n_{label},\n"
            f"        regexp_replace(t{i - 1}, '{p}', '{repl}', 'g') AS t{i}\n"
            f"    FROM {src}\n)"
        )
        cols.append(f"n_{label}")
    sql += (
        f"\nSELECT doc_id, {', '.join(cols)}, t{len(PII_PATTERNS)} AS text_redacted"
        f"\nFROM s{len(PII_PATTERNS)}"
    )
    return sql


@register("ta_redact_pii", _pii_oracle_sql)
def ta_redact_pii(spark, sf_dir):
    """PII scrub over text: URL → e-mail → IPv4 → phone placeholder
    substitution with per-category counts (operators/text_analysis.
    redact_pii). The oracle applies the IDENTICAL pattern sequence via
    DuckDB's RE2 — an independent regex engine agreeing on every byte of
    the redacted text is the cross-check."""
    from cdrc_semantic_search_spark.operators.text_analysis import redact_pii

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    decorated = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com via https://ex.org/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" or +1 415 555 "), F.col("doc_id").cast("string"),
            F.lit(" host 10.0."), (F.col("doc_id") % 200).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    out = redact_pii(decorated, "text")
    return out.select(
        "doc_id", "n_url", "n_email", "n_ipv4", "n_phone", "text_redacted"
    )


# =====================================================================
# collective entity linking (operators/linking.collective_link_mentions)
# =====================================================================

@register("kg_collective_linking", value_oracles.lazy("kg_collective_linking"))
def kg_collective_linking(spark, sf_dir):
    """Coherence-reranked entity disambiguation over the deterministic
    transcript fixture: per-mention top-3 candidates from the broadcast
    index, rescored by within-conversation candidate support
    (final = score + 0.25·(support−1)/max(n_mentions−1, 1)), argmax by
    min-of-struct. Oracle: pure-Python twin sharing the _topk_blend
    specification kernel, re-deriving mention extraction, support counts
    and the exact double arithmetic independently."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.operators.extraction import extract_mentions
    from cdrc_semantic_search_spark.operators.linking import (
        collective_link_mentions,
    )
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities)
    raw = extract_mentions(tdf, pipe.bc_catalogue)
    return collective_link_mentions(
        raw, pipe.bc_index, pipe.settings, k=3, beta=0.25
    )


# =====================================================================
# KG schema induction (operators/rules.py) — AMIE-style rule mining
# =====================================================================

def _fixture_kg_edges(spark):
    """Shared loader: the fixture pipeline's materialized kg_edges rollup
    (the table the schema-induction queries run on in production)."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities)
    return pipe.kg_edges(pipe.triples(tdf))


@register("kg_rule_confidence", value_oracles.lazy("kg_rule_confidence"))
def kg_rule_confidence(spark, sf_dir):
    """AMIE-style composition rules p1(a,x) ∧ p2(x,c) ⇒ p3(a,c) with
    standard confidence over the fixture's kg_edges (operators/rules.
    composition_rules) — the schema-discovery mining step downstream of
    graph materialization. Twin: plain dict adjacency + set membership
    (value_oracles)."""
    from cdrc_semantic_search_spark.operators.rules import composition_rules

    return composition_rules(_fixture_kg_edges(spark)).select(
        "p1", "p2", "p3", "support", "body_pairs", "confidence"
    )


@register("kg_pred_functionality", value_oracles.lazy("kg_pred_functionality"))
def kg_pred_functionality(spark, sf_dir):
    """Per-predicate functionality profile (operators/rules.
    predicate_functionality): distinct fact/subject/object counts and
    the AMIE fun/inv-fun ratios — flags predicates safe to treat as
    canonical single-valued attributes."""
    from cdrc_semantic_search_spark.operators.rules import (
        predicate_functionality,
    )

    return predicate_functionality(_fixture_kg_edges(spark))


@register("kg_inverse_relations", value_oracles.lazy("kg_inverse_relations"))
def kg_inverse_relations(spark, sf_dir):
    """Inverse-predicate candidates (operators/rules.inverse_relations):
    (p1, p2) pairs scored by mirrored-fact overlap and inclusion–
    exclusion jaccard — the ontology-merge feed."""
    from cdrc_semantic_search_spark.operators.rules import inverse_relations

    return inverse_relations(_fixture_kg_edges(spark))


@register(
    "dedup_repeated_spans",
    """
    WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT doc_id + 10000, text FROM documents WHERE doc_id < 30
    ),
    toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS t
        FROM base
    ),
    spans AS (
        SELECT doc_id, array_to_string(t[i:i+7], ' ') AS span
        FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS g(i)
        WHERE len(t) >= 8
    )
    SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM spans GROUP BY span HAVING COUNT(*) >= 2
    """,
)
def dedup_repeated_spans(spark, sf_dir):
    """Span-level dedup (operators/dedup.repeated_spans): 8-token sliding
    windows occurring ≥2 times corpus-wide, with doc/occurrence counts —
    the Lee-et-al exact-substring shape (memorized spans come from
    repeated SPANS, not repeated documents). A shifted dup block
    guarantees cross-doc repeats at test scale; the synthetic corpus
    also repeats spans naturally. The oracle is pure SQL (token split +
    lateral window enumeration), so the whole pipeline — normalization,
    window extents, both counts — is value-hash-checked."""
    from cdrc_semantic_search_spark.operators.dedup import repeated_spans

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.filter("doc_id < 300").unionByName(
        d.filter("doc_id < 30").select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    return repeated_spans(base, "doc_id", "text", span_tokens=8, min_occurrences=2)


@register(
    "mix_drift_psi",
    """
    WITH a AS (SELECT source FROM documents WHERE doc_id % 2 = 0),
    b AS (SELECT source FROM documents WHERE doc_id % 2 = 1 AND source <> 'src0'),
    ca AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_a FROM a GROUP BY source),
    cb AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_b FROM b GROUP BY source),
    j AS (
        SELECT COALESCE(ca.source, cb.source) AS source,
               COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
        FROM ca FULL OUTER JOIN cb ON ca.source = cb.source
    )
    SELECT source, n_a, n_b,
           ROUND(CAST(n_a AS DOUBLE) / (SELECT SUM(n_a) FROM ca), 6) AS p_a,
           ROUND(CAST(n_b AS DOUBLE) / (SELECT SUM(n_b) FROM cb), 6) AS p_b,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 THEN
               (CAST(n_a AS DOUBLE) / (SELECT SUM(n_a) FROM ca)
                - CAST(n_b AS DOUBLE) / (SELECT SUM(n_b) FROM cb))
               * LN((CAST(n_a AS DOUBLE) / (SELECT SUM(n_a) FROM ca))
                    / (CAST(n_b AS DOUBLE) / (SELECT SUM(n_b) FROM cb)))
           END, 6) AS psi_term
    FROM j
    """,
)
def mix_drift_psi(spark, sf_dir):
    """Domain-mix drift monitor (operators/split.distribution_psi):
    PSI terms of the documents.source distribution between two
    deterministic snapshots (even vs odd doc_ids, with one source
    dropped from the second snapshot so the vanished-category NULL path
    is exercised). Integer counts divide identically on both engines;
    the single ln() is the BM25-class determinism budget (round 6)."""
    from cdrc_semantic_search_spark.operators.split import distribution_psi

    d = load(spark, sf_dir, "documents")
    a = d.filter("doc_id % 2 = 0")
    b = d.filter("doc_id % 2 = 1 AND source <> 'src0'")
    return distribution_psi(a, b, "source")


@register(
    "kg_rule_pca_confidence", value_oracles.lazy("kg_rule_pca_confidence")
)
def kg_rule_pca_confidence(spark, sf_dir):
    """AMIE PCA confidence (operators/rules.composition_rules_pca): the
    partial-completeness denominator counts only body pairs whose
    subject asserts SOME p3 fact — the incomplete-KB-aware ranking the
    AMIE paper advocates over standard confidence. Twin re-derives the
    subject-predicate presence sets in plain dicts."""
    from cdrc_semantic_search_spark.operators.rules import (
        composition_rules_pca,
    )

    return composition_rules_pca(_fixture_kg_edges(spark))


@register(
    "graph_khop_ball",
    """
    WITH e AS (
        SELECT DISTINCT LEAST(l_suppkey, 1000 + l_partkey % 100) AS a,
               GREATEST(l_suppkey, 1000 + l_partkey % 100) AS b
        FROM lineitem WHERE l_orderkey < 300
    ),
    sym AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b, a FROM e),
    two AS (
        SELECT v, u FROM sym
        UNION
        SELECT s1.v, s2.u FROM sym s1 JOIN sym s2 ON s1.u = s2.v
        WHERE s1.v <> s2.u
    )
    SELECT v AS id, CAST(COUNT(*) AS BIGINT) AS ball_size
    FROM two GROUP BY v
    """,
)
def graph_khop_ball(spark, sf_dir):
    """Exact 2-hop neighborhood sizes (operators/graph.khop_ball_sizes)
    over the shared supplier↔bucket fixture graph — the pointwise
    neighborhood function (HyperBall's target quantity, exact at
    small k). Oracle: UNION-distinct closure of one self-join."""
    from cdrc_semantic_search_spark.operators.graph import khop_ball_sizes

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    return khop_ball_sizes(edges, k=2)


@register("graph_hyperball", value_oracles.lazy("graph_hyperball"))
def graph_hyperball(spark, sf_dir):
    """HyperBall 2-hop ball-size estimates (operators/graph.
    hyperball_ball_estimates) over the shared supplier↔bucket graph —
    the O(|V|·registers) sketch path whose exact small-graph oracle is
    graph_khop_ball. Twin re-derives balls by BFS and the crc32
    register algebra + HLL estimator bit-for-bit (value_oracles)."""
    from cdrc_semantic_search_spark.operators.graph import (
        hyperball_ball_estimates,
    )

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    return hyperball_ball_estimates(edges, k=2)


@register("kg_linking_ambiguity", value_oracles.lazy("kg_linking_ambiguity"))
def kg_linking_ambiguity(spark, sf_dir):
    """Surface-form ambiguity profile over COLLECTIVE linking output:
    per normalized surface — mention/conversation counts, distinct
    final entities (context-free linking is a pure function of the
    surface, so any n_entities > 1 is coherence reranking at work), and
    the modal entity. The disambiguation-pressure dashboard a KG
    curator reads before tightening the linker. One groupBy(surface)
    over the linked mention stream; the mode is a max-of-struct
    aggregate, not a window sort."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.operators.extraction import extract_mentions
    from cdrc_semantic_search_spark.operators.linking import (
        collective_link_mentions,
    )
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities)
    raw = extract_mentions(tdf, pipe.bc_catalogue)
    linked = collective_link_mentions(
        raw, pipe.bc_index, pipe.settings, k=3, beta=0.25
    )
    per_ent = linked.groupBy("surface", "entity_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_ent.join(
            linked.groupBy("surface").agg(
                F.count(F.lit(1)).alias("n_mentions"),
                F.count_distinct("conv_id").alias("n_convs"),
            ),
            "surface",
        )
        .groupBy("surface", "n_mentions", "n_convs")
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.min(
                F.struct((-F.col("c")).alias("negc"), F.col("entity_id").alias("e"))
            ).alias("t"),
        )
        .select(
            "surface", "n_mentions", "n_convs", "n_entities",
            F.col("t.e").alias("top_entity"),
            (-F.col("t.negc")).alias("top_count"),
        )
    )


@register(
    "graph_assortativity",
    """
    WITH e AS (
        SELECT DISTINCT LEAST(l_suppkey, 1000 + l_partkey % 100) AS a,
               GREATEST(l_suppkey, 1000 + l_partkey % 100) AS b
        FROM lineitem WHERE l_orderkey < 300
    ),
    sym AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT v, COUNT(*) AS d FROM sym GROUP BY v),
    paired AS (
        SELECT dx.d AS dx, dy.d AS dy
        FROM sym JOIN deg dx ON sym.v = dx.v JOIN deg dy ON sym.u = dy.v
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m2,
               CAST(SUM(dx * dy) AS BIGINT) AS sxy,
               CAST(SUM(dx) AS BIGINT) AS sx,
               CAST(SUM(dx * dx) AS BIGINT) AS sxx
        FROM paired
    )
    SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
           ROUND(CAST(m2 * sxy - sx * sx AS DOUBLE)
                 / CAST(m2 * sxx - sx * sx AS DOUBLE), 6) AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark, sf_dir):
    """Degree assortativity (operators/graph.degree_assortativity) over
    the shared supplier↔bucket graph — integer Pearson sums hoisted so
    the float tail is 3 exact ops + 1 division (the graph_modularity
    discipline)."""
    from cdrc_semantic_search_spark.operators.graph import degree_assortativity

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    return degree_assortativity(edges)


@register(
    "kg_entity_alignment",
    """
    WITH a AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % 2 = 0 AND vec_id < 400),
    b AS (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id % 2 = 1 AND vec_id < 400),
    scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS score
        FROM a, b
    ),
    fwd AS (
        SELECT id_a, id_b, score FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY score DESC, id_b ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    rev AS (
        SELECT id_a, id_b FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY id_b ORDER BY score DESC, id_a ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT fwd.id_a, fwd.id_b, ROUND(fwd.score, 6) AS score
    FROM fwd JOIN rev ON fwd.id_a = rev.id_a AND fwd.id_b = rev.id_b
    """,
)
def kg_entity_alignment(spark, sf_dir):
    """Reciprocal-nearest-neighbor entity alignment (operators/linking.
    reciprocal_best_match) between two embedding snapshots (even/odd
    vec_ids) — the mutual-top-1 gate a KG merge runs before fusing two
    catalogues. Oracle: brute-force cosine + two ROW_NUMBER windows +
    reciprocity join in pure SQL."""
    from cdrc_semantic_search_spark.operators.linking import (
        reciprocal_best_match,
    )

    e = load(spark, sf_dir, "embeddings").filter("vec_id < 400")
    a = e.filter("vec_id % 2 = 0")
    b = e.filter("vec_id % 2 = 1")
    return reciprocal_best_match(a, b, "vec_id", "embedding")


@register(
    "dedup_blocking_quality", value_oracles.lazy("dedup_blocking_quality")
)
def dedup_blocking_quality(spark, sf_dir):
    """Pair completeness + reduction ratio of the MinHash blocking vs
    exact shingle-Jaccard truth (operators/dedup.blocking_quality) on
    200 docs + 30 shifted clones — the grade a band/permutation config
    earns before running at corpus scale. Twin recomputes truth
    all-pairs and candidates by band-slice equality in plain Python."""
    from cdrc_semantic_search_spark.operators.dedup import blocking_quality

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.filter("doc_id < 200").unionByName(
        d.filter("doc_id < 30").select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    return blocking_quality(base, "doc_id", "text")


@register("graph_wl_colors", value_oracles.lazy("graph_wl_colors"))
def graph_wl_colors(spark, sf_dir):
    """Two rounds of Weisfeiler–Leman color refinement (operators/graph.
    wl_refinement) over the shared supplier↔bucket graph — per-vertex
    structural signatures (role discovery / substructure dedup
    fingerprints). Twin re-derives the degree seeds and the canonical
    crc32 renderings in plain dicts."""
    from cdrc_semantic_search_spark.operators.graph import wl_refinement

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    return wl_refinement(edges, n_rounds=2)


@register(
    "graph_neighborhood_fn", value_oracles.lazy("graph_neighborhood_fn")
)
def graph_neighborhood_fn(spark, sf_dir):
    """HyperBall neighborhood function N(t) for t ∈ [0, 3]
    (operators/graph.neighborhood_function) over the shared
    supplier↔bucket graph — the effective-diameter curve, with
    per-vertex estimates summed as integer millionths so the global
    rollup is summation-order-independent. Twin: exact BFS balls +
    identical register/estimator arithmetic."""
    from cdrc_semantic_search_spark.operators.graph import (
        neighborhood_function,
    )

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    return neighborhood_function(edges, max_t=3)


@register(
    "train_hard_negatives",
    """
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id, embedding, label FROM embeddings
          WHERE vec_id >= 50 AND vec_id < 450),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS score
        FROM q, c WHERE q.label <> c.label
    )
    SELECT q_id, c_id, ROUND(score, 6) AS score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY score DESC, c_id ASC) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def train_hard_negatives(spark, sf_dir):
    """Hard-negative mining (operators/similarity.hard_negatives): per
    query vector, the 3 most-similar DIFFERENT-label corpus vectors —
    the DPR-style negatives a bi-encoder trains against. Label filter
    fused before the rank windows. Oracle: brute-force + window."""
    from cdrc_semantic_search_spark.operators.similarity import hard_negatives

    e = load(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 50").select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    c = e.filter("vec_id >= 50 AND vec_id < 450").select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        F.col("label").alias("c_label"),
    )
    out = hard_negatives(q, c, k=3)
    return out.select(
        "q_id", "c_id", F.round("score", 6).alias("score"), "rank"
    )


@register("tr_conv_near_dup", value_oracles.lazy("tr_conv_near_dup"))
def tr_conv_near_dup(spark, sf_dir):
    """CONVERSATION-level near-dup detection: per-conversation ordered
    turn assembly (operators/assembly.assemble_conversations — the W5
    ordering contract) fed into MinHash+LSH (operators/dedup) with 20
    cloned conversations guaranteeing true positives — the dedup shape a
    10^12-turn transcript table needs (whole conversations recur via
    retries/reposts far more often than individual documents). Twin
    re-derives the ordered concat and the shared MinHash kernel in
    plain Python."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.operators.assembly import (
        assemble_conversations,
    )
    from cdrc_semantic_search_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    fx = fixtures.generate(seed=42, n_conversations=200, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    conv = assemble_conversations(tdf).select("conv_id", "conversation_text")
    first20 = sorted(fx.transcripts.conv_id.unique().tolist())[:20]
    clones = conv.filter(F.col("conv_id").isin(first20)).select(
        F.concat(F.lit("dup_"), F.col("conv_id")).alias("conv_id"),
        "conversation_text",
    )
    uni = conv.unionByName(clones)
    sigs = minhash_signatures(uni, "conv_id", "conversation_text", k=3, n_perm=64)
    return minhash_lsh_pairs(
        sigs, "conv_id", n_perm=64, n_bands=16, min_est_jaccard=0.9
    )


@register("graph_linkpred_auc", value_oracles.lazy("graph_linkpred_auc"))
def graph_linkpred_auc(spark, sf_dir):
    """Link-prediction AUC (operators/graph.linkpred_auc): positives =
    the fixture graph's own edges, negatives = md5-corrupted endpoints
    (join-picked from the row-numbered node table — no driver collect),
    common-neighbor scores, exact integer rank-sum AUC. Twin mirrors
    every step including the corruption hash."""
    from cdrc_semantic_search_spark.operators.graph import linkpred_auc

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .distinct()
    )
    wn = Window.orderBy("v")
    numbered = nodes.withColumn("rn", F.row_number().over(wn))
    n_nodes = numbered.agg(F.max("rn").alias("n"))
    hexpart = F.substring(
        F.md5(F.concat_ws("|", F.lit("neg"), F.col("a"), F.col("b"))), 1, 8
    )
    cand_idx = F.pmod(
        F.conv(hexpart, 16, 10).cast("long"), F.col("n")
    ).cast("int")
    neg = (
        und.crossJoin(F.broadcast(n_nodes))
        .withColumn("rn", cand_idx + 1)
        .join(F.broadcast(numbered.select("rn", F.col("v").alias("cand"))), "rn")
        .filter(F.col("cand") != F.col("a"))
        .select(
            F.least("a", "cand").alias("a"),
            F.greatest("a", "cand").alias("b2"),
        )
        .select(F.col("a"), F.col("b2").alias("b"))
        .join(und, ["a", "b"], "left_anti")
    )
    return linkpred_auc(edges, und, neg)


@register(
    "w10_distribution_ranks",
    """
    SELECT o_custkey,
           o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM orders WHERE o_custkey < 80
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def w10_distribution_ranks(spark, sf_dir):
    """Distribution-rank window family: percent_rank / cume_dist /
    ntile over a deterministic (o_custkey, o_orderkey) window — both
    ranks are exact rationals of integer row counts, ntile integer, so
    the cross-engine agreement is exact after the shared round-6."""
    o = load(spark, sf_dir, "orders").filter("o_custkey < 80")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "a10_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS BIGINT) AS gid
    FROM orders WHERE o_custkey < 500
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
)
def a10_grouping_sets(spark, sf_dir):
    """GROUPING SETS with grouping_id — the one multi-granularity
    aggregation idiom a8 (ROLLUP) and a9 (pivot) don't cover: an
    explicit lattice of group-bys in ONE pass (Spark expands to a
    single expand+aggregate, not four scans)."""
    o = load(spark, sf_dir, "orders").filter("o_custkey < 500")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                    AS BIGINT) AS gid
        FROM {o}
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        """,
        o=o,
    )


@register(
    "train_dsir_importance",
    f"""
    WITH t AS (
        SELECT doc_id, toks FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
        WHERE len(toks) >= 2
    ),
    bi AS (
        SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2
        FROM (SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(toks) - 1),
                                           i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS bg
              FROM t)
    ),
    tref AS (SELECT * FROM bi WHERE doc_id < 150),
    tcb AS (SELECT w1, w2, COUNT(*) AS cb FROM tref GROUP BY w1, w2),
    tcu AS (SELECT w1, COUNT(*) AS cu FROM tref GROUP BY w1),
    tv AS (SELECT COUNT(DISTINCT tok) AS v FROM (
        SELECT unnest({_SQL_TOKS}) AS tok FROM documents WHERE doc_id < 150)),
    sref AS (SELECT * FROM bi WHERE doc_id >= 150 AND doc_id < 300),
    scb AS (SELECT w1, w2, COUNT(*) AS cb FROM sref GROUP BY w1, w2),
    scu AS (SELECT w1, COUNT(*) AS cu FROM sref GROUP BY w1),
    sv AS (SELECT COUNT(DISTINCT tok) AS v FROM (
        SELECT unnest({_SQL_TOKS}) AS tok FROM documents
        WHERE doc_id >= 150 AND doc_id < 300)),
    tsc AS (
        SELECT bi.doc_id,
               CAST(ROUND(ln((COALESCE(tcb.cb, 0) + 1.0) / (COALESCE(tcu.cu, 0) + tv.v)), 7)
                    AS DECIMAL(18,7)) AS term
        FROM bi LEFT JOIN tcb USING (w1, w2) LEFT JOIN tcu USING (w1) CROSS JOIN tv
    ),
    ssc AS (
        SELECT bi.doc_id,
               CAST(ROUND(ln((COALESCE(scb.cb, 0) + 1.0) / (COALESCE(scu.cu, 0) + sv.v)), 7)
                    AS DECIMAL(18,7)) AS term
        FROM bi LEFT JOIN scb USING (w1, w2) LEFT JOIN scu USING (w1) CROSS JOIN sv
    ),
    ta AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                  ROUND(-CAST(SUM(term) AS DOUBLE) / COUNT(*), 6) AS ce_target
           FROM tsc GROUP BY doc_id),
    sa AS (SELECT doc_id, ROUND(-CAST(SUM(term) AS DOUBLE) / COUNT(*), 6) AS ce_source
           FROM ssc GROUP BY doc_id)
    SELECT ta.doc_id, n_bigrams, ce_target, ce_source,
           ROUND(ce_source - ce_target, 6) AS importance
    FROM ta JOIN sa ON ta.doc_id = sa.doc_id
    """,
)
def train_dsir_importance(spark, sf_dir):
    """DSIR data-selection importance weights (operators/text_analysis.
    dsir_importance): target LM trained on doc_id<150, source LM on
    150..299, every document scored against both — the importance-
    resampling selector a pretraining mix runs before sampling. Pure-SQL
    oracle reuses the ta_lm_cross_entropy determinism discipline
    (round-7 decimal terms, order-independent sums) twice."""
    from cdrc_semantic_search_spark.operators.text_analysis import (
        dsir_importance,
    )

    d = load(spark, sf_dir, "documents")
    return dsir_importance(
        d,
        d.filter("doc_id < 150"),
        d.filter("doc_id >= 150 AND doc_id < 300"),
        "doc_id",
        "text",
    )


@register(
    "emb_centroid_drift",
    """
    WITH ex AS (
        SELECT vec_id, label,
               UNNEST(range(len(embedding))) AS dim,
               UNNEST(embedding) AS x
        FROM embeddings
    ),
    ca AS (
        SELECT label, dim,
               ROUND(CAST(ROUND(SUM(CAST(x AS DECIMAL(38,18))), 8) AS DOUBLE)
                     / COUNT(*), 6) AS m,
               COUNT(*) AS n
        FROM ex WHERE vec_id % 2 = 0 GROUP BY label, dim
    ),
    cb AS (
        SELECT label, dim,
               ROUND(CAST(ROUND(SUM(CAST(x AS DECIMAL(38,18))), 8) AS DOUBLE)
                     / COUNT(*), 6) AS m,
               COUNT(*) AS n
        FROM ex WHERE vec_id % 2 = 1 GROUP BY label, dim
    ),
    p AS (
        SELECT ca.label, ca.n AS n_a, cb.n AS n_b,
               CAST(ca.m AS DECIMAL(19,6)) AS xa,
               CAST(cb.m AS DECIMAL(19,6)) AS xb
        FROM ca JOIN cb ON ca.label = cb.label AND ca.dim = cb.dim
    )
    SELECT CAST(label AS INTEGER) AS label,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(CAST(SUM(xa * xb) AS DOUBLE)
                 / (sqrt(CAST(SUM(xa * xa) AS DOUBLE))
                    * sqrt(CAST(SUM(xb * xb) AS DOUBLE))), 6) AS cos_drift
    FROM p GROUP BY label, n_a, n_b
    """,
)
def emb_centroid_drift(spark, sf_dir):
    """Embedding-space drift monitor (operators/rollup.centroid_drift):
    per-label centroid cosine between two snapshots (even/odd vec_ids)
    — the refresh gate for an embedding-backed linker. Decimal sums at
    every float reduction keep both engines bit-agreed."""
    from cdrc_semantic_search_spark.operators.rollup import centroid_drift

    e = load(spark, sf_dir, "embeddings")
    return centroid_drift(
        e.filter("vec_id % 2 = 0"), e.filter("vec_id % 2 = 1"),
        "label", "embedding",
    )


@register(
    "sample_bottom_k",
    """
    SELECT doc_id, source, CAST(rk AS INTEGER) AS __bk_rank FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (ORDER BY md5('bk|' || CAST(doc_id AS VARCHAR)) ASC,
                                  doc_id ASC) AS rk
        FROM documents
    ) WHERE rk <= 50
    """,
)
def sample_bottom_k(spark, sf_dir):
    """Deterministic bottom-k uniform sample (operators/split.
    bottom_k_sample): the 50 documents with the smallest md5(salt|key)
    — reproducible on any engine/partitioning and mergeable (bottom-k
    of per-partition bottom-ks). The oracle is the same order statistic
    in plain SQL."""
    from cdrc_semantic_search_spark.operators.split import bottom_k_sample

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    return bottom_k_sample(d, F.col("doc_id"), k=50)


@register(
    "scd2_doc_sources",
    """
    WITH hist AS (
        SELECT doc_id, source, DATE '2026-01-01' AS valid_from,
               CAST(NULL AS DATE) AS valid_to
        FROM documents WHERE doc_id < 400
    ),
    upd AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN source || '_v2' ELSE source END AS source,
               DATE '2026-02-01' AS ts
        FROM documents WHERE doc_id >= 200 AND doc_id < 600
    ),
    cur AS (SELECT * FROM hist WHERE valid_to IS NULL),
    j AS (
        SELECT COALESCE(cur.doc_id, upd.doc_id) AS doc_id,
               cur.source AS cv, cur.valid_from AS cfrom,
               upd.source AS uv, upd.ts AS uts
        FROM cur FULL OUTER JOIN upd ON cur.doc_id = upd.doc_id
    )
    SELECT doc_id, cv AS source, cfrom AS valid_from,
           CAST(NULL AS DATE) AS valid_to
    FROM j WHERE cv IS NOT NULL AND (uv IS NULL OR uv = cv)
    UNION ALL
    SELECT doc_id, cv, cfrom, uts
    FROM j WHERE cv IS NOT NULL AND uv IS NOT NULL AND uv <> cv
    UNION ALL
    SELECT doc_id, uv, uts, CAST(NULL AS DATE)
    FROM j WHERE uv IS NOT NULL AND (cv IS NULL OR uv <> cv)
    """,
)
def scd2_doc_sources(spark, sf_dir):
    """Type-2 SCD merge (operators/split.scd2_apply): a document-source
    dimension at two snapshots — overlapping keys with every third
    update changing the value exercise all four paths (no-op identical,
    close+insert changed, insert new, pass-through absent). Oracle:
    the same WHEN MATCHED/NOT MATCHED logic in plain SQL."""
    from cdrc_semantic_search_spark.operators.split import scd2_apply

    d = load(spark, sf_dir, "documents")
    hist = d.filter("doc_id < 400").select(
        "doc_id", "source",
        F.lit("2026-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    upd = d.filter("doc_id >= 200 AND doc_id < 600").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("source"), F.lit("_v2"))
        ).otherwise(F.col("source")).alias("source"),
        F.lit("2026-02-01").cast("date").alias("ts"),
    )
    return scd2_apply(hist, upd, ["doc_id"], ["source"], "ts")


@register("kg_popularity_drift", value_oracles.lazy("kg_popularity_drift"))
def kg_popularity_drift(spark, sf_dir):
    """Entity-popularity drift: PSI terms of the entity-mention
    distribution (subject + object occurrences of the fixture's
    triples) between the two observation windows kg_graph_diff splits
    at — the monitor that tells a curator WHICH entities moved, not
    just that the edge set changed. Composes the triple stream with
    operators/split.distribution_psi; twin re-derives occurrences and
    the PSI arithmetic in plain dicts."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.operators.split import distribution_psi
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    tdf, _ = fixtures.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities)
    tr = pipe.triples(tdf)
    ents = tr.select(
        "ts", F.explode(F.array("subj_entity_id", "obj_entity_id")).alias("entity_id")
    )
    a = ents.filter(F.col("ts") < "2026-05-01")
    b = ents.filter(F.col("ts") >= "2026-05-01")
    return distribution_psi(a, b, "entity_id")


@register("ann_ivf_recall", value_oracles.lazy("ann_ivf_recall"))
def ann_ivf_recall(spark, sf_dir):
    """Recall@5 of the IVF index against the exact scan, per query —
    the acceptance gate an ANN rollout runs before swapping indexes
    (pytest pins a recall floor; this entry makes the full per-query
    report a first-class, oracle-checked query). Pure counting on top
    of the two existing top-k operators: one (q_id, c_id) equi-join of
    their outputs."""
    from cdrc_semantic_search_spark.operators.similarity import (
        topk_cosine_exact,
        topk_cosine_ivf,
        train_centroids,
    )

    sample, q, c = _ann_fixture(spark, sf_dir)
    cent = train_centroids(sample, n_centroids=16, seed=42)
    exact = topk_cosine_exact(q, c, k=5).select("q_id", "c_id")
    ivf = topk_cosine_ivf(spark, q, c, cent, k=5, n_probe=4).select(
        "q_id", "c_id"
    )
    hits = exact.join(ivf, ["q_id", "c_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    per_q = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("k"))
    return (
        per_q.join(hits, "q_id", "left")
        .select(
            "q_id",
            F.col("k").cast("long").alias("k"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(F.coalesce("n_hit", F.lit(0)) / F.col("k"), 6).alias(
                "recall"
            ),
        )
    )


@register(
    "curation_quality_tiers",
    f"""
    WITH q AS (
        SELECT doc_id,
               CAST(len(toks) AS INT) AS q_n_tokens,
               ROUND(CASE WHEN len(toks) > 0
                     THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                     ELSE 0.0 END, 4) AS score
        FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    ),
    tiered AS (
        SELECT q.*, NTILE(4) OVER (ORDER BY score DESC, doc_id ASC) AS tier
        FROM q
    )
    SELECT CAST(tier AS INTEGER) AS tier,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(q_n_tokens) AS BIGINT) AS total_tokens,
           MIN(score) AS min_score, MAX(score) AS max_score
    FROM tiered GROUP BY tier
    """,
)
def curation_quality_tiers(spark, sf_dir):
    """The data-pyramid report: documents bucketed into quality
    quartiles (ntile over the round-4 distinct-token ratio, doc_id
    tie-break — fully deterministic) with doc and TOKEN totals per tier
    — the table a curator reads to decide how many tokens each quality
    band can contribute to a mix. Composes quality_features with the
    w10 window family; the rounded score is an exact rational so both
    engines tier identically."""
    from cdrc_semantic_search_spark.operators.text_analysis import (
        quality_features,
    )

    d = load(spark, sf_dir, "documents")
    q = quality_features(d, "text").select(
        "doc_id",
        "q_n_tokens",
        F.round("q_distinct_ratio", 4).alias("score"),
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    tiered = q.withColumn("tier", F.ntile(4).over(w))
    return tiered.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("q_n_tokens").cast("long").alias("total_tokens"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


@register(
    "kg_rule_confidence_capped",
    value_oracles.lazy("kg_rule_confidence_capped"),
)
def kg_rule_confidence_capped(spark, sf_dir):
    """The rule miner's hot-midpoint guard, oracle-pinned ACTIVE: a
    synthetic hub (4 fan-in × 3 fan-out = 12 > cap 9) is dropped from
    the midpoint role while every fixture rule survives — the VALUES
    twin models the identical drop, so capped output is value-hash-
    checked, not just row-counted (the dedup_minhash_lsh_capped
    discipline)."""
    from cdrc_semantic_search_spark.operators.rules import composition_rules

    base = _fixture_kg_edges(spark).select(
        "subj_entity_id", "pred", "obj_entity_id"
    )
    hub_in = spark.createDataFrame(
        [(f"S{i}", "feeds", "HUB") for i in range(4)],
        "subj_entity_id string, pred string, obj_entity_id string",
    )
    hub_out = spark.createDataFrame(
        [("HUB", "emits", f"T{j}") for j in range(3)],
        "subj_entity_id string, pred string, obj_entity_id string",
    )
    e = base.unionByName(hub_in).unionByName(hub_out)
    return composition_rules(e, max_mid_paths=9).select(
        "p1", "p2", "p3", "support", "body_pairs", "confidence"
    )


@register("graph_eff_diameter", value_oracles.lazy("graph_eff_diameter"))
def graph_eff_diameter(spark, sf_dir):
    """Effective diameter (operators/graph.effective_diameter): the
    0.9-quantile crossing of the HyperBall neighborhood function, with
    the comparison in exact integer millionths. Twin shares the
    register/estimator kernels end-to-end."""
    from cdrc_semantic_search_spark.operators.graph import effective_diameter

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey < 300")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    return effective_diameter(edges, max_t=4)


@register("ann_pq_recall", value_oracles.lazy("ann_pq_recall"))
def ann_pq_recall(spark, sf_dir):
    """Recall@5 of the PQ-ADC scan against the exact scan, per query —
    the 32×-compression acceptance gate beside ann_ivf_recall's
    candidate-cut gate; one equi-join of the two top-k outputs."""
    from cdrc_semantic_search_spark.operators.similarity import (
        topk_cosine_exact,
        topk_pq_adc,
        train_pq_codebooks,
    )

    sample, q, c = _ann_fixture(spark, sf_dir)
    books = train_pq_codebooks(sample, m=8, k=16, seed=42)
    exact = topk_cosine_exact(q, c, k=5).select("q_id", "c_id")
    adc = topk_pq_adc(spark, q, c, books, k=5).select("q_id", "c_id")
    hits = exact.join(adc, ["q_id", "c_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    per_q = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("k"))
    return (
        per_q.join(hits, "q_id", "left")
        .select(
            "q_id",
            F.col("k").cast("long").alias("k"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(F.coalesce("n_hit", F.lit(0)) / F.col("k"), 6).alias(
                "recall"
            ),
        )
    )
