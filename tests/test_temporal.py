"""asof_join / interval_join semantics on hand-built event tables."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from spatialdata_spark.operators.temporal import asof_join, interval_join


def _t(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_asof_inclusive_strict_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(5)), (2, 10, _t(20)), (3, 11, _t(3)), (4, 12, _t(9))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(100, 10, _t(5)), (101, 10, _t(15)), (102, 11, _t(7))],
        ["view_id", "user_id", "ts"],
    )
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, keys=["user_id"], right_payload=["view_id"]).collect()
    }
    # inclusive: equal timestamps match (event 1 at t=5 sees view at t=5)
    assert out[1]["r_view_id"] == 100
    assert out[2]["r_view_id"] == 101  # latest prior, not first
    assert out[3]["r_view_id"] is None  # right row is later -> no match
    assert out[3]["asof_ts"] is None
    assert out[4]["r_view_id"] is None  # user with no right rows at all
    strict = {
        r["event_id"]: r
        for r in asof_join(
            left, right, keys=["user_id"], right_payload=["view_id"], strict=True
        ).collect()
    }
    assert strict[1]["r_view_id"] is None  # strict: equal ts does NOT match
    assert strict[2]["r_view_id"] == 101


def test_interval_join_boundaries_and_bucket_crossing(spark):
    width = 10  # seconds
    left = spark.createDataFrame([(1, 7, _t(8))], ["id", "user_id", "ts"])
    right = spark.createDataFrame(
        [
            (20, 7, _t(7)),   # before the window
            (21, 7, _t(8)),   # exactly at start (inclusive)
            (22, 7, _t(13)),  # inside, in the NEXT 10s bucket (8 -> bucket 0; 13 -> bucket 1)
            (23, 7, _t(18)),  # exactly at end (inclusive)
            (24, 7, _t(19)),  # past the window
            (25, 8, _t(9)),   # other key
        ],
        ["id", "user_id", "ts"],
    )
    out = interval_join(left, right, keys=["user_id"], width_seconds=width)
    got = sorted((r["r_id"], r["gap_sec"]) for r in out.collect())
    assert got == [(21, 0), (22, 5), (23, 10)]
    # no duplicate pairs from the 2-bucket explode
    assert out.count() == out.select("l_id", "r_id").distinct().count()


def test_psi_drift_reference(spark):
    """PSI contributions vs the closed-form Python computation, with a
    category missing from one side yielding NULL."""
    import math
    from datetime import datetime

    from spatialdata_spark.operators.temporal import psi_drift

    early = datetime(2024, 1, 5)
    late = datetime(2024, 1, 20)
    rows = (
        [(i, early, 1, "click", 0.0, "{}") for i in range(6)]
        + [(10 + i, early, 1, "view", 0.0, "{}") for i in range(4)]
        + [(20 + i, late, 1, "click", 0.0, "{}") for i in range(3)]
        + [(30 + i, late, 1, "view", 0.0, "{}") for i in range(6)]
        + [(40 + i, late, 1, "error", 0.0, "{}") for i in range(1)]
    )
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r["category"]: r for r in psi_drift(ev, "2024-01-16").collect()}
    tb, tc = 10, 10
    for cat, nb, nc in [("click", 6, 3), ("view", 4, 6)]:
        p, q = nb / tb, nc / tc
        want = round((p - q) * math.log(p / q), 6)
        r = out[cat]
        assert (r["n_base"], r["n_cur"]) == (nb, nc)
        assert abs(r["psi_part"] - want) < 1e-9
    assert out["error"]["n_base"] == 0 and out["error"]["psi_part"] is None


def test_scd2_null_attr_opens_and_closes_runs(spark):
    from pyspark.sql import functions as F

    from spatialdata_spark.operators.temporal import scd2_intervals

    rows = [
        (1, "A", "2024-01-01 10:00:00", 1),
        (1, None, "2024-01-01 11:00:00", 2),
        (1, "A", "2024-01-01 12:00:00", 3),
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "event_type", "ts_s", "event_id"]
    ).select("user_id", "event_type", F.to_timestamp("ts_s").alias("ts"), "event_id")
    out = sorted(
        (
            (r["event_type"], str(r["valid_from"]), str(r["valid_to"]))
            for r in scd2_intervals(
                ev, key_col="user_id", attr_col="event_type",
                ts_col="ts", tiebreak_col="event_id",
            ).collect()
        ),
        key=lambda t: (t[1], t[0] or ""),
    )
    # a NULL attr is a run like any other: three disjoint intervals,
    # each closed by the next run's start — no shared __run, no
    # zero-width or overlapping interval
    assert out == [
        ("A", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
        (None, "2024-01-01 11:00:00", "2024-01-01 12:00:00"),
        ("A", "2024-01-01 12:00:00", "None"),
    ]


def test_psi_drift_rejects_unparseable_boundary(spark):
    import pytest

    from spatialdata_spark.operators.temporal import psi_drift

    ev = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="boundary"):
        psi_drift(ev, "16-01-2024")


def test_e6_signed_emit_values_and_overflow_raise(spark):
    # r12 pin for the shared microunit emit (functions/exact.py): the
    # *2e6 emit is the ONE place the DECIMAL(38,0) contract can
    # overflow AFTER the callers' own denominator guards — non-ANSI
    # decimal arithmetic returns NULL on overflow, so without the
    # guard a too-large series would leak silent NULLs instead of
    # failing the job (the ADVICE r11 finding on acf_daily /
    # weekday_profile).
    import pytest

    from pyspark.sql import functions as F

    from spatialdata_spark.functions.exact import e6_signed

    ok = spark.createDataFrame(
        [("3", "2"), ("-3", "2"), ("0", "7")], ["num_s", "den_s"]
    ).select(
        F.col("num_s").cast("decimal(38,0)").alias("num"),
        F.col("den_s").cast("decimal(38,0)").alias("den"),
    )
    got = [
        r["e6"]
        for r in ok.select(e6_signed("num", "den", "t").alias("e6"))
        .orderBy("e6")
        .collect()
    ]
    # 3/2 -> 1.5e6 half-up; sign mirrors half-AWAY-from-zero
    assert got == [-1500000, 0, 1500000]

    big = spark.createDataFrame([("9" * 37, "1")], ["num_s", "den_s"]).select(
        F.col("num_s").cast("decimal(38,0)").alias("num"),
        F.col("den_s").cast("decimal(38,0)").alias("den"),
    )
    # the contract is LOUDNESS, whatever the decimal mode: under ANSI
    # (Spark 4 default) the overflow raises Spark's own arithmetic
    # error before our guard; under non-ANSI it yields NULL and the
    # guard's raise fires.  Either way the job fails — never a silent
    # NULL row.
    with pytest.raises(
        Exception, match="overflow in the e6 emit|NUMERIC_VALUE_OUT_OF_RANGE"
    ):
        big.select(e6_signed("num", "den", "probe")).collect()
    with pytest.raises(
        Exception, match="overflow in the e6 emit|NUMERIC_VALUE_OUT_OF_RANGE"
    ):
        spark.conf.set("spark.sql.ansi.enabled", "false")
        try:
            big.select(e6_signed("num", "den", "probe")).collect()
        finally:
            spark.conf.unset("spark.sql.ansi.enabled")


def test_weekday_profile_single_column_select_still_raises(spark):
    # the weekday empty-series guard must survive a hand-narrowed
    # one-column select (per-column g() + the always-7-row spine)
    import pytest

    from pyspark.sql import functions as F

    from spatialdata_spark.operators.temporal import weekday_profile

    ev = spark.createDataFrame(
        [("2024-01-01 10:00:00",)], ["raw"]
    ).select(F.col("raw").cast("timestamp").alias("ts")).filter(F.lit(False))
    prof = weekday_profile(ev)
    for c in prof.columns:
        with pytest.raises(Exception, match="weekday_profile: empty series"):
            prof.select(c).collect()


def test_mann_kendall_single_column_select_still_raises(spark):
    import pytest

    from pyspark.sql import functions as F

    from spatialdata_spark.operators.temporal import mann_kendall_daily

    ev = spark.createDataFrame(
        [("2024-01-01 10:00:00",)], ["raw"]
    ).select(F.col("raw").cast("timestamp").alias("ts")).filter(F.lit(False))
    mk = mann_kendall_daily(ev)
    for c in mk.columns:
        with pytest.raises(Exception, match="mann_kendall_daily: empty series"):
            mk.select(c).collect()


def test_mann_kendall_monotone_and_constant(spark):
    import datetime

    from spatialdata_spark.operators.temporal import mann_kendall_daily

    base = datetime.datetime(2024, 3, 1)
    # strictly increasing counts 1..6 -> S = T(T-1)/2 = 15, no ties
    ev = []
    for d in range(6):
        for j in range(d + 1):
            ev.append((len(ev), base + datetime.timedelta(days=d, hours=j)))
    r = mann_kendall_daily(
        spark.createDataFrame(ev, ["event_id", "ts"])
    ).collect()[0]
    assert (r["n_days"], r["s"]) == (6, 15)
    assert r["z"] > 0
    # constant series: S = 0, var18 = 0, z NULL (documented)
    ev2 = []
    for d in range(5):
        for j in range(3):
            ev2.append((len(ev2), base + datetime.timedelta(days=d, hours=j)))
    r2 = mann_kendall_daily(
        spark.createDataFrame(ev2, ["event_id", "ts"])
    ).collect()[0]
    assert (r2["s"], r2["var18"]) == (0, 0)
    assert r2["z"] is None


def test_ewma_max_lag_62_still_works(spark):
    # regression pin for the e6_signed denominator type: a BIGINT 2^62
    # literal times the helper's *2 overflows int64 (ANSI constant-fold
    # error / non-ANSI sign flip) — the denominator must enter as
    # DECIMAL so the legal [1, 62] bound keeps working end-to-end
    import datetime

    from spatialdata_spark.operators.temporal import ewma_daily

    base = datetime.datetime(2024, 6, 1)
    ev = [(i, base + datetime.timedelta(days=i % 3)) for i in range(9)]
    rows = ewma_daily(
        spark.createDataFrame(ev, ["event_id", "ts"]), max_lag=62
    ).collect()
    assert len(rows) == 3
    # day 1: E = 3/2 exactly -> 1_500_000 microunits
    assert rows[0]["ewma_e6"] == 1_500_000
