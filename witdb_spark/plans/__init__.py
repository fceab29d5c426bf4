from witdb_spark.plans.dialect import transpile

__all__ = ["transpile"]
