from dataval_spark.plans import explain

__all__ = ["explain"]
