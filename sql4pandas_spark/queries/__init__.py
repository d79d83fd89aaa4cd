from sql4pandas_spark.queries.catalog import CATALOG, QuerySpec, load_catalog, query

__all__ = ["CATALOG", "QuerySpec", "load_catalog", "query"]
