from spatialdata_spark.pipeline import dedup, filters, multimodal, similarity, textstats

__all__ = ["dedup", "filters", "multimodal", "similarity", "textstats"]
