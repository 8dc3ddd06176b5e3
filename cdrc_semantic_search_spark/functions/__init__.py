from cdrc_semantic_search_spark.functions import text, vector  # noqa: F401
