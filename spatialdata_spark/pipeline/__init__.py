from spatialdata_spark.pipeline import dedup, multimodal, similarity, textstats

__all__ = ["dedup", "multimodal", "similarity", "textstats"]
