"""Source readers & sinks (SURVEY §2.1/§2.2) — thin, schema-explicit wrappers.

Every at-rest format the reference touches, re-expressed:

* JSON with nested resources (S1/S6)  → ``read_json_catalogue`` with an
  explicit nested schema (never schema inference in production paths)
* raw text logs (S4)                  → ``read_text_logs``
* CSV (S5)                            → ``read_csv``
* binary documents (S2)               → ``read_binary_dir``
  (recursiveFileLookup, the SimpleDirectoryReader analog)
* JSON/CSV/parquet writes (K3/K6)     → ``write_*``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the reference's catalogue record shape (query_api.py:74-94): id, title,
# url, notes + nested resources[{name,url,format,id,last_modified}]
CATALOGUE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("notes", T.StringType()),
        T.StructField(
            "resources",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("url", T.StringType()),
                        T.StructField("format", T.StringType()),
                        T.StructField("id", T.StringType()),
                        T.StructField("last_modified", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_json_catalogue(spark: SparkSession, path: str) -> DataFrame:
    """S1: JSON catalogue scan with explicit nested schema."""
    return spark.read.schema(CATALOGUE_SCHEMA).json(path)


def parse_catalogue_json(df: DataFrame, json_col: str) -> DataFrame:
    """S1 (streaming/column form): parse JSON strings with the explicit
    schema via from_json (F9)."""
    return df.select(F.from_json(F.col(json_col), CATALOGUE_SCHEMA).alias("rec")).select(
        "rec.*"
    )


def read_text_logs(spark: SparkSession, path: str) -> DataFrame:
    """S4: raw access-log scan → one row per line (cdrc_logs.py:7-10)."""
    return spark.read.text(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """S5: CSV scan (evaluation.py:42-44). Explicit DDL schema preferred;
    header inference only for ad-hoc use."""
    reader = spark.read.option("header", "true")
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S2: recursive binary-document scan (SimpleDirectoryReader analog,
    datastore.py:97-104) → (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """K3: JSON write (query_api.py:120-124)."""
    df.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """K6: CSV write (evaluation.py:80, cdrc_logs.py:45)."""
    df.write.mode("overwrite").option("header", "true").csv(path)
