from demo_iceberg_permanent_delete_spark.sources.tables import TABLES, load_tables, table_path

__all__ = ["TABLES", "load_tables", "table_path"]
