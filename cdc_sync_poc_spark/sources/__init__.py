from cdc_sync_poc_spark.sources.loader import TABLES, load_all, load_table

__all__ = ["TABLES", "load_all", "load_table"]
