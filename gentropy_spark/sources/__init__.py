from gentropy_spark.sources.readers import Tables, read_table

__all__ = ["Tables", "read_table"]
