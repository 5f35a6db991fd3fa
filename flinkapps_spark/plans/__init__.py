from flinkapps_spark.plans.catalog import QueryDef, query, registry, queries, oracle_sql

__all__ = ["QueryDef", "query", "registry", "queries", "oracle_sql"]
