from spatialdata_spark.functions.affine import affine_exprs, apply_affine

__all__ = ["affine_exprs", "apply_affine"]
