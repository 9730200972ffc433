from gentropy_spark.plans.registry import QuerySpec, full_registry

__all__ = ["QuerySpec", "full_registry"]
