from sql4pandas_spark.sources.parquet import TABLES, register_tables, table

__all__ = ["TABLES", "register_tables", "table"]
