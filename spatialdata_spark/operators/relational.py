"""Relational (element ↔ annotation-table) query operators.

Reference: src/spatialdata/_core/query/relational_query.py —
join_spatialelement_table :558-686 with the five ``how`` modes
(left :434, inner :337, right :293, left_exclusive :398,
right_exclusive :249), match wrappers :719-832, get_values :981-1109,
get_element_instances :62-120, filter_by_table_query :835-910.

Spark-first: every mode is a semi/anti/inner equi-join on
``(region_key, instance_key)``.  The instance-id side of the join is
small relative to the fact tables, and Catalyst broadcasts it; no mode
needs a UDF.  Background label 0 is dropped wherever labels produce
instance ids (reference convention, relational_query.py:104-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_MODES = ("left", "inner", "right", "left_exclusive", "right_exclusive")


def element_instance_ids(df: DataFrame, kind: str, instance_col: str | None = None) -> DataFrame:
    """Distinct instance ids of an element as a 1-column DataFrame
    (reference: get_element_instances, relational_query.py:62-120)."""
    if kind == "shapes":
        col = instance_col or "shape_id"
        return df.select(F.col(col).alias("instance_id")).distinct()
    if kind == "points":
        col = instance_col or "instance_id"
        return df.select(F.col(col).alias("instance_id")).distinct()
    if kind == "labels":
        return (
            df.select(F.col("label").alias("instance_id"))
            .filter(F.col("instance_id") != 0)
            .distinct()
        )
    raise ValueError(f"Element kind {kind!r} has no instance ids")


def join_element_table(
    element_df: DataFrame,
    element_name: str,
    element_kind: str,
    table_df: DataFrame,
    how: str = "left",
    region_key: str = "region",
    instance_key: str = "instance_id",
    element_instance_col: str | None = None,
) -> tuple[DataFrame | None, DataFrame | None]:
    """The five join modes between one element and its annotation table.

    Returns ``(element_out, table_out)`` — either may be None for the
    exclusive modes, mirroring the reference API.
    """
    if how not in JOIN_MODES:
        raise ValueError(f"how={how!r}; valid modes: {JOIN_MODES}")

    inst_col = element_instance_col or {"shapes": "shape_id", "points": "instance_id", "labels": "label"}[element_kind]
    ids = element_instance_ids(element_df, element_kind, element_instance_col)
    table_region = table_df.filter(F.col(region_key) == element_name)
    table_keys = table_region.select(F.col(instance_key).alias("instance_id")).distinct()

    if how == "left":
        # element as-is; table filtered to matching instances
        table_out = table_region.join(
            F.broadcast(ids), table_region[instance_key] == ids["instance_id"], "left_semi"
        )
        return element_df, table_out
    if how == "inner":
        element_out = element_df.join(
            F.broadcast(table_keys), element_df[inst_col] == table_keys["instance_id"], "left_semi"
        )
        table_out = table_region.join(
            F.broadcast(ids), table_region[instance_key] == ids["instance_id"], "left_semi"
        )
        return element_out, table_out
    if how == "right":
        element_out = element_df.join(
            F.broadcast(table_keys), element_df[inst_col] == table_keys["instance_id"], "left_semi"
        )
        return element_out, table_region
    if how == "left_exclusive":
        element_out = element_df.join(
            F.broadcast(table_keys), element_df[inst_col] == table_keys["instance_id"], "left_anti"
        )
        return element_out, None
    # right_exclusive
    table_out = table_region.join(
        F.broadcast(ids), table_region[instance_key] == ids["instance_id"], "left_anti"
    )
    return None, table_out


def match_table_to_element_ordered(
    element_df: DataFrame,
    element_order_cols: list[str],
    table_df: DataFrame,
    element_name: str,
    element_kind: str = "shapes",
    region_key: str = "region",
    instance_key: str = "instance_id",
    element_instance_col: str | None = None,
) -> DataFrame:
    """``match_rows='left'`` (reference: relational_query.py:482-504):
    the table is reordered to the element's row order.

    DataFrames have no implicit order, so the element's order must be
    named by ``element_order_cols``; the element gets a dense position
    via a window, the table joins on the instance key and sorts by that
    position (exposed as ``__element_pos`` so downstream zips stay
    aligned).  Note this is a global sort — exactly the semantic the
    reference's pandas reindex implies.
    """
    from pyspark.sql.window import Window

    inst_col = element_instance_col or {"shapes": "shape_id", "points": "instance_id", "labels": "label"}[element_kind]
    pos = element_df.select(
        F.col(inst_col).alias("__match_id"),
        F.row_number().over(Window.orderBy(*element_order_cols)).alias("__element_pos"),
    )
    table_region = table_df.filter(F.col(region_key) == element_name)
    return (
        table_region.join(F.broadcast(pos), table_region[instance_key] == pos["__match_id"])
        .drop("__match_id")
        .orderBy("__element_pos")
    )


def match_table_to_element(element_df, element_name, element_kind, table_df, **kw) -> DataFrame:
    """Convenience: table rows annotating the element
    (reference: relational_query.py:719-767)."""
    _, table_out = join_element_table(element_df, element_name, element_kind, table_df, how="left", **kw)
    return table_out


def match_element_to_table(element_df, element_name, element_kind, table_df, **kw) -> DataFrame:
    """Convenience: element rows annotated by the table
    (reference: relational_query.py:770-832)."""
    element_out, _ = join_element_table(element_df, element_name, element_kind, table_df, how="right", **kw)
    return element_out


def filter_labels_by_table(labels_df: DataFrame, table_df: DataFrame, element_name: str,
                           region_key: str = "region", instance_key: str = "instance_id") -> DataFrame:
    """Zero out label pixels whose id is not annotated
    (reference: relational_query.py:1112-1156, filter_label_pixels)."""
    keep = (
        table_df.filter(F.col(region_key) == element_name)
        .select(F.col(instance_key).alias("__keep_id"))
        .distinct()
    )
    joined = labels_df.join(
        F.broadcast(keep), labels_df["label"] == keep["__keep_id"], "left"
    )
    return joined.withColumn(
        "label", F.when(F.col("__keep_id").isNull(), F.lit(0)).otherwise(F.col("label"))
    ).drop("__keep_id")


def get_values(
    value_key: str,
    element_df: DataFrame | None = None,
    table_df: DataFrame | None = None,
    x_long: DataFrame | None = None,
    obsm_long: DataFrame | None = None,
    obsm_ndim: int | None = None,
    region: str | None = None,
    region_key: str = "region",
    instance_key: str = "instance_id",
) -> DataFrame:
    """Locate a value column across element / table obs / long-form X /
    obsm (reference: relational_query.py:981-1109, _locate_value :948).

    Resolution order mirrors the reference: element columns, then table
    obs columns, then var names in the long-form X table, then obsm
    array keys.  Returns a DataFrame of ``(instance_id, value)`` — or,
    for an obsm hit, ``(instance_id, {key}_0 .. {key}_{k-1})``, the
    reference's per-dimension column expansion of an obs × k array.

    ``obsm_long`` is the long form ``(obs_id, key, dim, value)``; pass
    ``obsm_ndim`` (the array width, known from table metadata) to keep
    the pivot a single pass — without it a tiny distinct-dims job runs
    first.
    """
    if element_df is not None and value_key in element_df.columns:
        id_col = "shape_id" if "shape_id" in element_df.columns else "instance_id"
        return element_df.select(F.col(id_col).alias("instance_id"), F.col(value_key).alias("value"))
    if table_df is not None and value_key in table_df.columns:
        scoped = table_df.filter(F.col(region_key) == region) if region else table_df
        return scoped.select(F.col(instance_key).alias("instance_id"), F.col(value_key).alias("value"))
    if x_long is not None:
        # long-form X (obs_id, var_name, value): pushdown filter on var_name
        # replaces the reference's CSC column-slice trick (models CSC note,
        # rasterize_bins.py:178-185)
        hit = x_long.filter(F.col("var_name") == value_key)
        if obsm_long is None:
            return hit.select(F.col("obs_id").alias("instance_id"), F.col("value"))
        # both X and obsm present: prefer X when the key matches a var;
        # checking requires a lookup, so fall through only when empty is
        # knowable cheaply — mirror the reference's locate order by
        # trying X first and letting an empty result defer to obsm.
        if hit.limit(1).count() > 0:
            return hit.select(F.col("obs_id").alias("instance_id"), F.col("value"))
    if obsm_long is not None:
        hit = obsm_long.filter(F.col("key") == value_key)
        if obsm_ndim is not None:
            dims = list(range(obsm_ndim))
        else:
            dims = sorted(int(r[0]) for r in hit.select("dim").distinct().collect())
        if not dims:
            raise KeyError(f"value_key {value_key!r} not found in obsm")
        # groupBy-pivot on the (tiny, known) dim domain: one shuffle on
        # obs_id, map-side partials, k output columns — the long-form
        # analog of slicing an obs × k array (relational_query.py:1049).
        pivoted = (
            hit.groupBy(F.col("obs_id").alias("instance_id"))
            .pivot("dim", dims)
            .agg(F.first("value"))
        )
        renames = [F.col("instance_id")] + [
            F.col(str(d)).alias(f"{value_key}_{d}") for d in dims
        ]
        return pivoted.select(*renames)
    raise KeyError(f"value_key {value_key!r} not found in element, table, X, or obsm")


def filter_table_by_var_predicate(
    x_long: DataFrame, var_df: DataFrame, predicate, var_key: str = "var_name"
) -> DataFrame:
    """Filter the long-form X matrix to variables whose var-metadata rows
    satisfy a predicate (reference filter_by_table_query var branch,
    relational_query.py:835-910).

    var is the small dimension (genes), so the surviving names broadcast
    and the X filter is a broadcast semi-join — no shuffle of X."""
    keep = var_df.filter(predicate).select(var_key)
    return x_long.join(F.broadcast(keep), var_key, "left_semi")


def filter_table_by_var_names(x_long: DataFrame, names: list[str], var_key: str = "var_name") -> DataFrame:
    """Filter long-form X to an explicit var_names list (reference
    var_names predicate): a literal isin — pushed down to the scan."""
    return x_long.filter(F.col(var_key).isin(list(names)))


def filter_by_table_predicate(
    ds,
    table_name: str,
    predicate,
) -> "object":
    """Filter a table by a Spark SQL predicate and re-match annotated
    elements (reference: relational_query.py:835-910 with annsel
    Predicates replaced by Catalyst expressions).

    ``predicate`` is a Column or SQL string usable in ``DataFrame.filter``.
    Returns a new SpatialDataset with the filtered table and semi-joined
    elements.
    """
    from spatialdata_spark.catalog import SpatialDataset

    table_df = ds.tables[table_name]
    meta = ds.table_meta[table_name]
    filtered = table_df.filter(predicate)

    out = SpatialDataset(ds.spark)
    out.elements["tables"][table_name] = filtered
    out.table_meta[table_name] = meta
    for region in meta.region:
        kind = ds.kind_of(region)
        element_df = ds[region]
        element_out, _ = join_element_table(
            element_df,
            region,
            kind,
            filtered,
            how="right",
            region_key=meta.region_key,
            instance_key=meta.instance_key,
        )
        out.elements[kind][region] = element_out
        out.transforms[region] = dict(ds.transforms.get(region, {}))
    return out


def concatenate_tables(tables: list[DataFrame], region_suffixes: list[str] | None = None,
                       region_key: str = "region") -> DataFrame:
    """Union of annotation tables with optional region re-keying
    (reference: _core/concatenate.py:28-78)."""
    out = []
    for i, t in enumerate(tables):
        if region_suffixes:
            t = t.withColumn(region_key, F.concat(F.col(region_key), F.lit(region_suffixes[i])))
        out.append(t)
    result = out[0]
    for t in out[1:]:
        result = result.unionByName(t, allowMissingColumns=True)
    return result
