from spatialdata_spark.streaming import windows

__all__ = ["windows"]
