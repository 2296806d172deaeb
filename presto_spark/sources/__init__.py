from presto_spark.sources.catalog import TABLES, register_tables

__all__ = ["TABLES", "register_tables"]
