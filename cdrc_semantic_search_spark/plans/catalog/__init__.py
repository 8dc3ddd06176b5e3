"""Catalog query registry, split by family (round-7 registry
maintenance). Import ``cdrc_semantic_search_spark.plans.catalog_queries``
— NOT the chunks directly — to get the fully-populated ``REGISTRY``
with the original registration order."""
