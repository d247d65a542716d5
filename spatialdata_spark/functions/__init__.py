from spatialdata_spark.functions.affine import affine_exprs, apply_affine
from spatialdata_spark.functions.joins import salted_join, two_phase_count

__all__ = ["affine_exprs", "apply_affine", "salted_join", "two_phase_count"]
