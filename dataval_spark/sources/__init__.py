from dataval_spark.sources.tableio import TableIO, iceberg_available

__all__ = ["TableIO", "iceberg_available"]
