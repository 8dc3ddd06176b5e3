"""Catalogue ingestion plan — the reference's stage 1 re-expressed
(/root/reference/src/query_api.py): CKAN catalogue JSON → filtered child
resource table with parent back-pointers + synthesized notes documents.

Reference behaviors covered, declaratively:

* nested ``resources`` flatten (1:N child table)           query_api.py:74-81
* "profile|flyer" resource filter, case-insensitive (P1)   query_api.py:78
* url basename + filename templating (F4/F5)               query_api.py:79,108-112
* presence predicates (P2): skip records without resources/notes
                                                           query_api.py:75-76,83-84
* notes document synthesis: title + HTML-stripped notes
  (K4/F3/F6)                                               query_api.py:84-94
* change ledger {name: last_modified} (K7/I1) → the commit
  ledger in sources/catalog.py plays this role

The reference re-reads both metadata JSONs per document and linear-scans
them (datastore.py:19-42); here metadata is read ONCE and every lookup is
a broadcast hash join (J1/J2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.functions.text import (
    filename_template,
    notes_document,
    url_basename,
)


def flatten_resources(catalogue: DataFrame) -> DataFrame:
    """catalogue (nested) → files metadata: one row per kept resource with
    ``parent_id`` back-pointer and derived ``filename``."""
    kept = (
        catalogue.filter(F.col("resources").isNotNull())  # P2
        .select(
            F.col("id").alias("parent_id"),
            F.explode("resources").alias("res"),
        )
        .filter(F.lower(F.col("res.name")).rlike("profile|flyer"))  # P1
        .filter(F.col("res.url").isNotNull() & (F.col("res.url") != ""))  # P3
    )
    kind = F.when(
        F.lower(F.col("res.name")).contains("profile"), F.lit("profile")
    ).otherwise(F.lit("flyer"))
    return kept.select(
        F.col("res.id").alias("id"),
        "parent_id",
        F.col("res.name").alias("name"),
        F.col("res.url").alias("url"),
        F.lower(F.col("res.format")).alias("format"),
        F.col("res.last_modified").alias("last_modified"),
        url_basename(F.col("res.url")).alias("url_basename"),
        filename_template(kind, F.col("res.id"), F.col("res.format")).alias("filename"),
    )


def notes_documents(catalogue: DataFrame) -> DataFrame:
    """Synthesized notes docs: ``notes-{id}`` with title + stripped notes
    body (the reference writes these as .txt files; here they are rows —
    a projection, not a sink)."""
    return (
        catalogue.filter(F.col("notes").isNotNull() & (F.col("notes") != ""))  # P2
        .select(
            F.concat(F.lit("notes-"), F.col("id")).alias("doc_id"),
            F.col("id").alias("parent_id"),
            notes_document(F.col("title"), F.col("notes")).alias("text"),
        )
    )


def enrich_documents(docs: DataFrame, files_meta: DataFrame, catalogue: DataFrame) -> DataFrame:
    """J1/J2: doc → file → parent catalogue metadata, as broadcast joins.

    The reference raises on a missing parent (datastore.py:42); here the
    inner join drops them and ``missing`` can be audited via anti-join.
    """
    kind_id = F.split(F.col("doc_id"), "-", 2)  # P7
    with_ids = docs.withColumn("kind", F.element_at(kind_id, 1)).withColumn(
        "main_id", F.element_at(kind_id, 2)
    )
    f = files_meta.select(
        F.col("id").alias("main_id"), F.col("parent_id").alias("file_parent_id")
    )
    c = catalogue.select(
        F.col("id").alias("cat_id"), "title", F.col("url").alias("cat_url")
    )
    via_file = with_ids.join(F.broadcast(f), "main_id", "left")
    parent = F.coalesce(F.col("file_parent_id"), F.col("main_id"))
    return (
        via_file.withColumn("cat_id", parent)
        .join(F.broadcast(c), "cat_id", "inner")
        .select(
            "doc_id", "kind", "main_id",
            F.col("cat_id").alias("parent_id"), "title", "cat_url",
        )
    )
