"""Temporal joins Spark lacks as built-ins: as-of (most-recent-prior)
and banded interval (range) joins.

Both are classic event-pipeline operators (session attribution,
conversion windows, feature look-back joins).  Neither exists in the
reference (spatialdata has no event-time model) — they extend the
engine's streaming/event family the same way the dedup/ANN operators
extend its table family, and both have exact relational oracles
(DuckDB ``ASOF JOIN`` / inequality join).

Scale shapes:

* ``asof_join`` is NOT a join at all in the plan: both sides union
  into one stream and a single window over ``(keys..., ts, side)``
  carries the latest right-side value forward.  One shuffle on the
  key — the same partitioning a 1000-executor backfill wants, with no
  build side to blow up and no skew amplification beyond the key's own
  row count.
* ``interval_join`` is the banded range join: the left side explodes
  to the (at most two) ``width``-sized time buckets its window can
  touch, the join is an equi-join on ``(keys..., bucket)``, and the
  exact range predicate refines after.  Work is proportional to true
  pair density per bucket, never |L|x|R| per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    right_payload: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the latest right row with the same
    keys and ``right.ts <= left.ts`` (``<`` when ``strict``).

    Matches DuckDB ``l ASOF LEFT JOIN r ON keys AND l.ts >= r.ts``.
    Right rows should be unique per ``(keys, ts)`` — pre-aggregate the
    right side if not, exactly as a deterministic ASOF requires.
    Output: every left column, plus ``asof_ts`` (the matched right
    timestamp, null when no match) and the requested right payload
    columns (null when no match).
    """
    right_payload = right_payload or []
    # side 0 sorts before side 1 at equal ts -> inclusive semantics;
    # strict mode sorts right rows AFTER left rows at the same instant
    r_side, l_side = (1, 0) if strict else (0, 1)
    lcols = [c for c in left.columns]
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.col(ts_col).alias("__asof_ts"),
        *[F.col(c).alias(f"__rp_{c}") for c in right_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__asof_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__rp_{c}")
            for c in right_payload
        ],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("__asof_ts", ignorenulls=True).over(w).alias("__m_ts"),
        *[
            F.last(f"__rp_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_payload
        ],
    )
    out = carried.filter(F.col("__side") == l_side).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__m_ts").alias("asof_ts"),
        *[F.col(f"__m_{c}").alias(f"r_{c}") for c in right_payload],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    width_seconds: int = 86400,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All pairs with equal keys and ``left.ts <= right.ts <=
    left.ts + width_seconds`` — the bounded-lookahead range join
    (conversion windows, label look-forward).

    Banded plan: a right row at epoch ``t`` lives in bucket
    ``t // width``; a left window ``[t0, t0 + width]`` can only touch
    buckets ``t0 // width`` and ``t0 // width + 1``, so the left side
    explodes x2, the join is a plain equi-join on ``(keys, bucket)``,
    and the exact predicate refines.  Output carries every column of
    both sides under the given prefixes plus ``gap_sec``.
    """
    # microsecond arithmetic throughout: the range predicate must agree
    # with full-precision timestamp comparison, not second truncation
    wus = int(width_seconds) * 1_000_000
    lb = (F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(wus)).cast("long")
    l = left.select(
        *[F.col(k) for k in keys],
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__lt"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
        F.explode(F.array(lb, lb + 1)).alias("__bucket"),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__rt"),
        (F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(wus)).cast("long").alias("__bucket"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
    )
    joined = l.join(r, [*keys, "__bucket"]).filter(
        (F.col("__rt") >= F.col("__lt")) & (F.col("__rt") <= F.col("__lt") + F.lit(wus))
    )
    return joined.select(
        *keys,
        *[f"{left_prefix}{c}" for c in left.columns],
        *[f"{right_prefix}{c}" for c in right.columns],
        F.floor((F.col("__rt") - F.col("__lt")) / F.lit(1_000_000)).cast("long").alias("gap_sec"),
    )


def gap_fill_hourly(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-series gap filling with forward fill: bucket each key's
    events into hours, emit a row for EVERY hour between that key's
    first and last active hour (zero-count gap hours included), and
    carry the last observed reading forward across gaps — the
    regularization step every downstream windowed model assumes
    (sensor panels, rate dashboards, feature backfills).

    Scale shape: the hourly rollup is one map-side-combinable
    aggregation; the per-key hour skeleton explodes from the ALREADY
    AGGREGATED extent (never from raw events — a key's skeleton is
    its active-span length in hours, not its event count); skeleton
    and rollup meet by UNION + re-aggregation on ``(key, hour)`` (the
    union reuses the rollup's partitioning — no agg-agg equi-join for
    Catalyst to sort-merge); the forward fill is one window per key
    ordered by hour, whose partition is span-sized.  Values quantize
    to integer cents so the "last reading" is exact, and the last
    reading within an hour is a ``max`` over ``(ts, id, cents)``
    structs — an aggregation, deterministic under ties, never a
    window over raw events.

    Output: ``(key, hour 'yyyy-MM-dd HH:mm:ss', n_events,
    filled_cents)``.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    hr = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        events.select(
            F.col(key_col).alias("__k"),
            hr.alias("__hr"),
            us.alias("__us"),
            F.col(id_col).alias("__id"),
            cents.alias("__c"),
        )
        .groupBy("__k", "__hr")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.max(F.struct("__us", "__id", "__c")).alias("__last"),
        )
        .select("__k", "__hr", "__n", F.col("__last.__c").alias("__cents"))
    )
    skeleton = (
        hourly.groupBy("__k")
        .agg(F.min("__hr").alias("__lo"), F.max("__hr").alias("__hi"))
        .select(
            "__k",
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("__hr"),
            F.lit(0).cast("long").alias("__n"),
            F.lit(None).cast("long").alias("__cents"),
        )
    )
    merged = (
        hourly.unionByName(skeleton)
        .groupBy("__k", "__hr")
        .agg(F.sum("__n").alias("n_events"), F.max("__cents").alias("__cents"))
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return merged.select(
        F.col("__k").alias(key_col),
        F.date_format("__hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n_events").cast("long").alias("n_events"),
        F.last("__cents", ignorenulls=True).over(w).alias("filled_cents"),
    )


def rolling_active_users(
    events: DataFrame,
    windows: tuple[int, ...] = (7, 28),
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Rolling distinct active users (WAU/MAU) per calendar day —
    the growth-analytics companion to cumulative DAU, computed in the
    contribution-explode form: a (user, day) activity row contributes
    to the ``w`` window endpoints ``day .. day+w-1``, so the whole
    computation is one map-side explode plus one distinct aggregation
    — NO range join, NO per-day ``COUNT(DISTINCT)`` over a sliding
    frame (the quadratic trap), and no window function at all.

    Shuffle volume is ``|user-days| * sum(windows)`` — bounded by
    calendar x users x 35, exact by construction; at extreme scale
    the documented swap is per-day HLL sketches merged by register
    max over the window (:func:`...textstats.hll_distinct` shape).

    Output: ``(day, window_days, n_active)`` for every observed-range
    day, where ``n_active`` counts users active in the trailing
    ``window_days`` days ending at ``day``.
    """
    # persist: the distinct (user, day) activity table — the small
    # projection of the event stream — feeds the max-day bound and one
    # explode per window; un-cached, each consumer replayed the full
    # event scan + distinct (3 live scans, tools/rescan_audit.py).
    # PER-CALL ACCUMULATION (the _approx_rank_bins contract):
    # LRU-reclaimed; clearCache() reclaims eagerly.
    ud = (
        events.select(
            F.to_date(F.col(ts_col)).alias("__d"),
            F.col(user_col).alias("__u"),
        )
        .distinct()
        .persist()
    )
    bounds = ud.agg(F.max("__d").alias("__mx"))
    parts = None
    for w in windows:
        c = ud.select(
            F.explode(
                F.sequence(F.col("__d"), F.date_add(F.col("__d"), int(w) - 1))
            ).alias("__day"),
            "__u",
            F.lit(int(w)).alias("window_days"),
        )
        parts = c if parts is None else parts.unionByName(c)
    return (
        parts.crossJoin(F.broadcast(bounds))
        .filter(F.col("__day") <= F.col("__mx"))
        .groupBy("__day", "window_days")
        .agg(F.countDistinct("__u").cast("long").alias("n_active"))
        .select(
            F.date_format("__day", "yyyy-MM-dd").alias("day"),
            F.col("window_days").cast("long").alias("window_days"),
            "n_active",
        )
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse an event
    stream into per-key validity intervals of an attribute — one row
    per run of consecutive equal values, ``[valid_from, valid_to)``
    with ``valid_to`` NULL on the current row.  The standard warehouse
    dimension-history shape (and the inverse of an as-of join: a probe
    at time t lands in exactly one interval).

    Plan: run boundaries are a per-key ``lag`` comparison, run ids a
    per-key running SUM of the change flags, both over the SAME
    (key, ts, tiebreak) window ordering — one sort, no join; the
    interval rollup is one aggregation per run plus a ``lead`` for the
    exclusive upper bound over a window that REUSES the key
    partitioning.  Deterministic under timestamp ties via the
    tiebreak column.

    Output: ``(key, attr, valid_from, valid_to, n_events)``.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    marked = events.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
    ).withColumn(
        "__chg",
        # NULL-SAFE change detection: a NULL attr must open (and close)
        # a run like any other value — `lag != attr` is NULL when either
        # side is NULL, which would silently merge a NULL-attr row into
        # the previous run and leave two iv rows sharing one __run (a
        # nondeterministic lead chain).  row_number==1 marks the first
        # row explicitly so a leading NULL attr is not conflated with
        # "no previous row".
        F.when(
            (
                F.row_number().over(
                    Window.partitionBy("key").orderBy("__ts", "__tb")
                )
                == 1
            )
            | ~F.lag("attr")
            .over(Window.partitionBy("key").orderBy("__ts", "__tb"))
            .eqNullSafe(F.col("attr")),
            1,
        ).otherwise(0),
    )
    runs = marked.withColumn(
        "__run",
        F.sum("__chg").over(
            Window.partitionBy("key")
            .orderBy("__ts", "__tb")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    iv = runs.groupBy("key", "__run", "attr").agg(
        F.min("__ts").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    # Order by the run id, not valid_from: two runs can share a
    # valid_from (attr change at a timestamp tie — the case the
    # tiebreak column exists for), and __run is the unique per-key run
    # sequence the lag/lead chain was built on.
    wk = Window.partitionBy("key").orderBy("__run")
    return iv.select(
        F.col("key").alias(key_col),
        F.col("attr").alias(attr_col),
        "valid_from",
        F.lead("valid_from").over(wk).alias("valid_to"),
        "n_events",
    )


def psi_drift(
    events: DataFrame,
    boundary: str,
    cat_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Population Stability Index contributions of a categorical
    column between the records before and after ``boundary`` — the
    standard production drift monitor (PSI < 0.1 stable, > 0.25
    shifted) applied to the event mix.

    ``psi_part = (p - q) * ln(p / q)`` per category with
    ``p``/``q`` the category's share before/after the split; the total
    PSI is the sum over rows.  Categories absent from either side get
    a NULL ``psi_part`` (the standard smoothing decision is the
    caller's — silently substituting an epsilon would fabricate mass).

    Plan: ONE category-keyed count aggregation with map-side combine
    (both periods in the same pass via conditional sums); totals are a
    1-row broadcast; everything after the first aggregation is
    category-cardinality-sized at any event volume.

    Output: ``(category, n_base, n_cur, psi_part)`` with ``psi_part``
    6 dp, ordered by category.

    The boundary string is validated DRIVER-SIDE before any Spark work:
    an unparseable boundary would cast to NULL timestamp, silently
    classify every row as "current", and report "no data before the
    boundary" instead of failing — the reject-loudly convention.  Rows
    with a NULL timestamp are likewise counted as current by the
    ``otherwise`` branch; filter upstream if that is not the intent.
    """
    from datetime import datetime

    parsed = None
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            parsed = datetime.strptime(str(boundary), fmt)
            break
        except ValueError:
            continue
    if parsed is None:
        raise ValueError(
            f"psi_drift: boundary {boundary!r} is not ISO 'YYYY-MM-DD"
            f"[ HH:MM:SS]' — an unparseable boundary would silently"
            f" classify every row as current"
        )
    base_flag = F.when(F.col(ts_col) < F.lit(boundary).cast("timestamp"), 1).otherwise(0)
    counts = events.select(
        F.col(cat_col).alias("category"), base_flag.alias("__b")
    ).groupBy("category").agg(
        F.sum("__b").cast("long").alias("n_base"),
        F.sum(1 - F.col("__b")).cast("long").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_base").cast("long").alias("__tb"),
        F.sum("n_cur").cast("long").alias("__tc"),
    )
    p = F.col("n_base") / F.col("__tb")
    q = F.col("n_cur") / F.col("__tc")
    part = F.when(
        (F.col("n_base") > 0) & (F.col("n_cur") > 0),
        F.round((p - q) * F.log(p / q), 6),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select("category", "n_base", "n_cur", part.alias("psi_part"))
        .orderBy("category")
    )


def cramers_v_drift(
    events: DataFrame,
    boundary: str,
    cat_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Cramér's V association between a categorical column and the
    before/after-``boundary`` period — the chi-square companion of
    :func:`psi_drift` (PSI weights by log-ratio and breaks on empty
    cells; V is the normalized effect size in [0, 1], defined whenever
    both periods have rows).

    With contingency counts ``n_ij`` (category i, period j), row/col
    margins ``r_i``/``c_j`` and total ``N``::

        chi2 = sum_ij (N*n_ij - r_i*c_j)^2 / (N * r_i * c_j)
        V    = sqrt(chi2 / (N * (min(R, C) - 1)))

    Exactness: the per-cell numerator ``(N*n_ij - r_i*c_j)^2`` and
    denominator ``N*r_i*c_j`` are exact DECIMAL(38,0) integers (no
    int64 ceiling at N ~ billions); each cell contributes ONE
    fixed-arity double division, summed over the category×2 cell table
    (category-cardinality-sized at any event volume, map-side
    combine), 6 dp — the family's documented absorption.

    Output: one row ``(n, n_categories, chi2, cramers_v)``; NULL V
    when either period is empty or only one category exists (no
    association is defined — the margins make chi2 0/0).

    NULL convention (same as ``cohens_kappa``): rows with a NULL
    category or NULL timestamp are EXCLUDED up front.  A NULL category
    would otherwise form its own margin group whose grid equi-join on
    ``__cat`` never matches (SQL NULL semantics) — its observed counts
    coalesce to 0 while its margin still contributes, inflating chi2 —
    and a NULL ts would silently classify as 'current'.

    The boundary string is validated driver-side exactly like
    :func:`psi_drift` (an unparseable boundary would silently classify
    every row as current).
    """
    from datetime import datetime

    parsed = None
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            parsed = datetime.strptime(str(boundary), fmt)
            break
        except ValueError:
            continue
    if parsed is None:
        raise ValueError(
            f"cramers_v_drift: boundary {boundary!r} is not ISO"
            f" 'YYYY-MM-DD[ HH:MM:SS]' — an unparseable boundary would"
            f" silently classify every row as current"
        )
    dec = "decimal(38,0)"
    base_flag = F.when(
        F.col(ts_col) < F.lit(boundary).cast("timestamp"), 1
    ).otherwise(0)
    cells = (
        events.filter(F.col(cat_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(cat_col).alias("__cat"), base_flag.alias("__j"))
        .groupBy("__cat", "__j")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        # persist: the contingency table is (categories x 2)-sized but
        # its lineage is the corpus scan — margins, column margins,
        # totals, and the grid join each replayed it (4 live scans,
        # tools/rescan_audit.py; the mutual_information precedent).
        # PER-CALL ACCUMULATION (the _approx_rank_bins contract):
        # LRU-reclaimed; clearCache() reclaims eagerly.
        .persist()
    )
    margins = cells.groupBy("__cat").agg(
        F.sum("__n").cast("long").alias("__r")
    )
    cols = cells.groupBy("__j").agg(F.sum("__n").cast("long").alias("__c"))
    tot = cells.agg(
        F.sum("__n").cast("long").alias("__t"),
        F.count_distinct("__cat").cast("long").alias("__ncat"),
        F.count_distinct("__j").cast("long").alias("__nper"),
    )
    # the FULL R x C grid, not just observed cells: a category absent
    # from one period still contributes its expected-count term
    grid = margins.crossJoin(cols).join(
        cells, ["__cat", "__j"], "left"
    ).crossJoin(F.broadcast(tot))
    n_ij = F.coalesce(F.col("__n"), F.lit(0)).cast(dec)
    num = (F.col("__t").cast(dec) * n_ij - F.col("__r").cast(dec) * F.col("__c").cast(dec))
    den = (F.col("__t").cast(dec) * F.col("__r").cast(dec) * F.col("__c").cast(dec))
    cell_term = (num * num).cast("double") / den.cast("double")
    agg = grid.agg(
        F.max("__t").alias("n"),
        F.max("__ncat").alias("n_categories"),
        F.max("__nper").alias("__np"),
        F.sum(cell_term).alias("__chi2"),
    )
    dof = F.least(F.col("n_categories"), F.col("__np")) - 1
    return agg.select(
        "n",
        "n_categories",
        F.round(F.col("__chi2"), 6).alias("chi2"),
        F.when(
            (F.col("__np") == 2) & (F.col("n_categories") >= 2),
            F.round(F.sqrt(F.col("__chi2") / (F.col("n") * dof)), 6),
        ).alias("cramers_v"),
    )


def _daily_event_counts(events: DataFrame, ts_col: str) -> DataFrame:
    """Shared day-bucketing convention for the daily monitors
    (cusum_drift / ewma_daily): yyyy-MM-dd string day keys, exact
    int64 counts, NULL timestamps dropped (a NULL day is not a
    calendar position)."""
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def _calendar_daily_index(events: DataFrame, ts_col: str) -> DataFrame:
    """Shared zero-densified calendar index of the daily monitors
    (ewma_daily / acf_daily / mann_kendall_daily): one row per calendar
    day in ``[min_day, max_day]`` with the day's event count (0 on
    outage days — a has-events-only index would shift phases, freeze
    decayed levels, and bias trends) and a 1-based day index.
    Day-calendar-sized at any corpus scale; the single-partition
    row_number window is the documented absorption."""
    counts = _daily_event_counts(events, ts_col)
    span = counts.agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
    calendar = span.select(
        F.explode(F.sequence(F.to_date("__d0"), F.to_date("__d1"))).alias("__date")
    ).select(F.date_format("__date", "yyyy-MM-dd").alias("day"))
    daily = calendar.join(counts, "day", "left").select(
        "day",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
    )
    # persist: the consumers downstream (totals, both lag-join sides,
    # tie groups) otherwise each replay the CORPUS-SIZED day-keyed
    # count — the compiled acf plan scanned the events parquet SIX
    # times (tools/rescan_audit.py), which at 100 TB is six full
    # passes for one day-calendar-sized result.  Calendar-sized rows,
    # MEMORY_AND_DISK, the ≥3-consumers rule at plan granularity (the
    # minhash band-table LRU contract).  PER-CALL ACCUMULATION (the
    # _approx_rank_bins contract): never unpersisted here — one cache
    # entry per distinct input plan, LRU-reclaimed; monitors scoring
    # many corpora reclaim eagerly with spark.catalog.clearCache().
    from pyspark import StorageLevel

    return daily.withColumn(
        "__i", F.row_number().over(Window.orderBy("day")).cast("long")
    ).persist(StorageLevel.MEMORY_AND_DISK)


def cusum_drift(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """EXACT CUSUM (Page 1954) of daily event volume against the
    uniform-rate null — the change-point report for ingest monitoring
    ("did the feed's daily rate shift, and when?"): a level shift makes
    the cumulative deviation ramp, so the |max| day marks the most
    likely change point, where per-day eyeballing sees only noise.

    With per-day counts ``n_1..n_D`` and total ``N``, the classic
    statistic cumulates deviations from the mean ``N/D``.  Scaling by
    ``D`` keeps it integer::

        S_i = sum_{j<=i} (n_j * D - N)        (S_D = 0 identically)

    Every term is an exact int64 (counts and one multiply — ``n_j*D``
    is bounded by N*D, far inside int64 at any daily volume), so the
    whole curve replays bit-exactly in SQL.  Consumers wanting the
    classical scale divide by D.

    Plan: one day-keyed count (map-side combinable — the only
    corpus-sized work), then the cumulative window over the
    DAY-CALENDAR-sized table (hundreds of rows at any corpus size,
    the documented single-partition-window absorption); the total is
    a 1-row broadcast.  NULL timestamps are DROPPED (the
    cramers_v_drift convention: a NULL day is not a calendar
    position).

    Output: one row per day ``(day, n_events, cusum_num, is_peak)``
    ordered by day, with ``day`` a yyyy-MM-dd string (the repo's
    cross-engine day convention) and ``is_peak`` marking the max-|S|
    day(s) — the change-point candidate.
    """
    from pyspark.sql.window import Window

    # persist: day-sized rows over a corpus-sized lineage — totals,
    # the peak scan, and the final projection would otherwise each
    # replay the full day-keyed count (4 scans in the compiled plan,
    # tools/rescan_audit.py; the calendar-index persist rationale,
    # including its per-call accumulation + clearCache() contract)
    daily = _daily_event_counts(events, ts_col).persist()
    tot = daily.agg(
        F.sum("n_events").cast("long").alias("__n"),
        F.count(F.lit(1)).cast("long").alias("__d"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "day",
            "n_events",
            F.sum(F.col("n_events") * F.col("__d") - F.col("__n"))
            .over(w)
            .cast("long")
            .alias("cusum_num"),
        )
    )
    peak = cum.agg(F.max(F.abs(F.col("cusum_num"))).alias("__peak"))
    return (
        cum.crossJoin(F.broadcast(peak))
        .select(
            "day",
            "n_events",
            "cusum_num",
            (F.abs(F.col("cusum_num")) == F.col("__peak")).alias("is_peak"),
        )
        .orderBy("day")
    )


def ewma_daily(
    events: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 40,
) -> DataFrame:
    """EXACT exponentially-weighted moving average of daily event
    volume — the smoothed-rate companion of :func:`cusum_drift`
    (CUSUM finds the change point; EWMA is the live smoothed level an
    alerting threshold compares against).

    THE DYADIC CONTRACT: with ``alpha = 1/2`` (this operator's fixed
    smoothing — the classic "half yesterday's estimate plus half
    today") and zero initialization, the textbook recursion
    ``E_i = (1-a) E_{i-1} + a n_i`` unrolls to pure powers of two::

        E_i = sum_{j <= i} n_j * 2^-(i-j+1)

    Truncating lags beyond ``max_lag`` (weights < 2^-40 ~ 1e-12 —
    far below any count's significance) makes the whole statistic an
    exact INTEGER rational with denominator ``2^max_lag``::

        num_i  = sum_{i-max_lag < j <= i} n_j << (max_lag - (i-j) - 1)
        ewma_e6 = round_half_up(num_i * 10^6 / 2^max_lag)

    so the output is exact int64 microunits — NO floating point in
    the contract at all (the repo's modularity_e6 convention; a
    float ``pow(0.5, k)`` chain would ride libm differences and
    order-dependent summation).  Each ``n_j * 2^w`` product multiplies
    in DECIMAL(38,0) — a BIGINT product would silently wrap past
    ~2^24 events/day at the default lag depth.

    CALENDAR SEMANTICS: the index runs over every calendar day in
    ``[min_day, max_day]`` — zero-event days are densified in, so the
    smoothed level DECAYS through an outage exactly as the daily
    recursion says (a has-events-only index would report yesterday's
    level as "live" right after a gap — the worst moment to
    overstate it).  Zero-event days appear in the output with
    ``n_events = 0``.

    ``max_lag`` must be in [1, 62]: Spark's shiftleft wraps its shift
    count mod 64 (silently wrong weights), so the bound is validated
    loudly driver-side.

    Plan: one day-keyed count (the only corpus-sized work), the
    calendar densify + row-number index over the DAY-CALENDAR-sized
    table, then the lag pair join runs on that tiny table
    (days x max_lag pairs).  NULL timestamps dropped (the
    cusum_drift convention).

    Output: one row per calendar day ``(day, n_events, ewma_e6)``
    ordered by day; consumers wanting the float divide by 1e6.
    """
    dec = "decimal(38,0)"
    k = int(max_lag)
    if not (1 <= k <= 62):
        raise ValueError(
            f"ewma_daily: max_lag must be in [1, 62] (got {k}) — Spark's"
            " shiftleft wraps shift counts mod 64, which would produce"
            " silently wrong weights"
        )
    # densify to the full calendar: zero-event days must decay the level
    idx = _calendar_daily_index(events, ts_col)
    a = idx.select(F.col("day"), F.col("n_events"), F.col("__i"))
    b = idx.select(
        F.col("__i").alias("__j"), F.col("n_events").alias("__nj")
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("__j") <= F.col("__i")) & (F.col("__j") > F.col("__i") - k),
    )
    w = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({k} - (__i - __j) - 1 AS INT))")
    # multiply in DECIMAL: BIGINT n_j * 2^(k-1) wraps past ~2^24/day
    num = F.sum(F.col("__nj").cast(dec) * w.cast(dec))
    agg = pairs.groupBy("day", "n_events").agg(num.alias("__num"))
    # e6_signed((num, 2^k)) computes (num*2e6 + 2^k) div 2^(k+1), which
    # equals the former (num*1e6 + 2^(k-1)) div 2^k identically (both
    # terms halve exactly) — and raises LOUDLY if the *2e6 emit
    # overflows 38 digits (the acf/weekday/cvm emit-guard convention;
    # this was the fourth family member still carrying the bare emit)
    from spatialdata_spark.functions.exact import e6_signed

    # the denominator must enter e6_signed as DECIMAL: the helper
    # computes (den)*2, and a BIGINT literal 2^62 times 2 overflows
    # int64 (ANSI: constant-folding ARITHMETIC_OVERFLOW; non-ANSI:
    # sign-flipped silent wrong values) — the k=62 legal maximum
    me6 = e6_signed("__num", f"CAST({1 << k} AS DECIMAL(38,0))", "ewma_daily")
    return agg.select("day", "n_events", me6.alias("ewma_e6")).orderBy("day")


def acf_daily(
    events: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """EXACT sample autocorrelation of daily event volume at lags
    ``1..max_lag`` — the seasonality probe of the daily-monitor family
    (:func:`cusum_drift` finds the level shift, :func:`ewma_daily`
    smooths the level; ACF answers "does the series repeat weekly?" —
    a lag-7 spike is the signature of a weekday cycle).

    THE INTEGER-RATIONAL CONTRACT (the modularity / ewma_e6
    convention): with the textbook estimator

        acf_k = sum_{t<=T-k} (c_t - m)(c_{t+k} - m)
              / sum_{t<=T}   (c_t - m)^2 ,   m = S/T

    multiplying numerator and denominator by ``T^2`` clears the
    rational mean EXACTLY::

        NUM_k = T^2 P_k - T S (A_k + B_k) + (T-k) S^2
        DEN   = T^2 Q   - T S^2

    with ``P_k = sum c_t c_{t+k}``, ``A_k/B_k`` the head/tail sums,
    ``Q = sum c_t^2``, ``S = sum c_t`` — every term an exact integer
    accumulated in DECIMAL(38,0) (a BIGINT T^2 P_k wraps past ~10^4
    events/day on a year of data), and the output is one
    half-away-from-zero integer division to int64 microunits
    (``acf_e6``); NO floating point anywhere in the contract.  The
    38-digit budget must cover the FINAL ``|NUM_k| * 2e6`` emit, not
    just the accumulators — i.e. ``T^2 * P_k < ~5e31``, roughly
    ``daily_count^2 * T^3 < 5e31`` — and BOTH the denominator and the
    emit raise loudly on overflow (no silent NULL at any magnitude).

    CALENDAR SEMANTICS: the series runs over EVERY calendar day in
    ``[min_day, max_day]`` with zero-event days densified in (the
    ewma_daily convention) — a lag on a has-events-only index would
    correlate positions, not days, and any outage would silently
    shift the phase of the weekly cycle.

    A constant series (DEN = 0 — every calendar day has the same
    count) has no defined ACF and raises loudly, the ks_2sample
    convention; so do an empty series and a single-day series.  Both
    raises ride a 1..max_lag lag SPINE so they fire even when no lag
    has pairs (a column-attached raise on an empty result would be
    silently bypassed).  Output rows cover the REALIZED lags only
    (lag <= T-1); lags past the span are dropped, not zero-filled.

    Plan: one day-keyed count (the ONLY corpus-sized work), calendar
    densify + row-number over the day-calendar-sized table, one
    broadcast lag self-join (days x max_lag pairs), one 1-row totals
    broadcast — everything after the first aggregation is
    calendar-sized at any corpus scale.

    Output: ``(lag, n_pairs, acf_e6)`` for lag 1..max_lag ordered by
    lag; consumers wanting the float divide by 1e6.
    """
    dec = "decimal(38,0)"
    k = int(max_lag)
    if k < 1:
        raise ValueError(f"acf_daily: max_lag must be >= 1 (got {k})")
    idx = _calendar_daily_index(events, ts_col).select(
        "day", F.col("n_events").alias("n"), "__i"
    )
    tot = idx.agg(
        F.count(F.lit(1)).cast("long").alias("__t"),
        F.sum("n").cast(dec).alias("__s"),
        F.sum(F.col("n").cast(dec) * F.col("n").cast(dec)).alias("__q"),
    )
    a = idx.select(F.col("__i"), F.col("n").alias("__na"))
    b = idx.select(F.col("__i").alias("__j"), F.col("n").alias("__nb"))
    per_lag = (
        a.join(
            F.broadcast(b),
            (F.col("__j") > F.col("__i")) & (F.col("__j") <= F.col("__i") + k),
        )
        .groupBy((F.col("__j") - F.col("__i")).cast("long").alias("lag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("__na").cast(dec) * F.col("__nb").cast(dec)).alias("__p"),
            F.sum(F.col("__na").cast(dec)).alias("__a"),
            F.sum(F.col("__nb").cast(dec)).alias("__b"),
        )
    )
    # join per-lag sums onto a 1..max_lag SPINE: the spine always has
    # rows, so the empty-series / zero-variance loud errors below are
    # evaluated even when NO lag has pairs (an empty per_lag would
    # otherwise return [] silently, bypassing a column-attached raise)
    lags = (
        events.sparkSession.range(1, k + 1)
        .select(F.col("id").cast("long").alias("lag"))
    )
    j = lags.crossJoin(F.broadcast(tot)).join(F.broadcast(per_lag), "lag", "left")
    num = (
        F.col("__t").cast(dec) * F.col("__t").cast(dec) * F.col("__p")
        - F.col("__t").cast(dec) * F.col("__s") * (F.col("__a") + F.col("__b"))
        + (F.col("__t") - F.col("lag")).cast(dec) * F.col("__s") * F.col("__s")
    )
    den = (
        F.col("__t").cast(dec) * F.col("__t").cast(dec) * F.col("__q")
        - F.col("__t").cast(dec) * F.col("__s") * F.col("__s")
    )
    # ONE filter expression carrying both raises: two conjuncts would
    # let predicate reordering short-circuit past the guard on the
    # cheap n_pairs null check, silently skipping the loud error
    ok_pairs = (
        F.when(
            F.col("__t").isNull() | (F.col("__t") == 0),
            F.raise_error(F.lit("acf_daily: empty series (no non-NULL timestamps)")),
        )
        .when(
            # den NULL = DECIMAL(38,0) overflow of T^2*Q - T*S^2 under
            # non-ANSI decimal arithmetic: must stay LOUD, not leak
            # silent NULL acf_e6 rows (den <= 0 alone is NULL-blind)
            den.isNull() | (den <= 0),
            F.raise_error(
                F.lit(
                    "acf_daily: zero variance or DECIMAL overflow in the"
                    " denominator — every calendar day has the same count,"
                    " or T^2*Q exceeds 38 digits"
                )
            ),
        )
        .otherwise(F.col("n_pairs"))
    )
    withnd = j.select(
        "lag", "n_pairs", num.alias("__num"), den.alias("__den"), ok_pairs.alias("__ok")
    ).filter(F.col("__ok").isNotNull())
    # the *2e6 emit itself can overflow 38 digits long before __den
    # does (the guard above covers only the denominator) — e6_signed
    # raises loudly instead of leaking a silent NULL acf_e6 row
    from spatialdata_spark.functions.exact import e6_signed

    e6 = e6_signed("__num", "__den", "acf_daily")
    return withnd.select("lag", "n_pairs", e6.alias("acf_e6")).orderBy("lag")


def weekday_profile(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Day-of-week event profile with an EXACT chi-square uniformity
    statistic — the calendar-shaped companion of :func:`acf_daily`
    (ACF detects that a weekly cycle exists; this names WHICH weekdays
    carry it, and the chi-square grades how far the stream sits from
    the uniform-rate null).  r12 registry candidate (the
    library-level-first modularity precedent).

    INTEGER-RATIONAL CONTRACT: with ``o_d`` the event count on ISO
    weekday ``d`` (Monday=1..Sunday=7 on BOTH engines: Spark
    ``weekday()+1`` = DuckDB ``isodow``) and ``N = sum o_d``::

        dev_d = o_d/N - 1/7 = (7*o_d - N) / (7*N)
        chi2  = sum_d (o_d - N/7)^2 / (N/7) = sum_d (7*o_d - N)^2 / (7*N)

    both exact rationals — DECIMAL(38,0) inside, emitted as
    half-away-from-zero (``dev_e6``) / half-up (``chi2_e6``) int64
    microunits.  The 38-digit budget must cover the FINAL ``*2e6``
    emit: ``(7*o_d - N)^2 * 2e6`` fits while ``N < ~5e14`` (not the
    accumulator-only ~5e17), and the emit raises loudly on overflow
    (no silent NULL at any magnitude).  ``frac`` is one division
    of exact integers, 6 dp.  NULL timestamps dropped (the family
    convention); an EMPTY series raises loudly on every output column
    (the herfindahl per-column pattern — the 7-row weekday spine
    always exists, so the raise is always evaluable).

    Plan: one weekday-keyed count (the only corpus-sized work; 7
    groups, map-side combinable), then everything runs on the 7-row
    spine — the flattest temporal shape.

    Output: 7 rows ``(dow, n_events, frac, dev_e6, chi2_e6)`` ordered
    by dow; ``chi2_e6`` is the same whole-profile statistic repeated
    per row (grid-constant column, the benford_frac convention).
    """
    from spatialdata_spark.functions.exact import e6_signed

    dec = "decimal(38,0)"
    counts = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy((F.expr(f"weekday({ts_col})") + 1).cast("int").alias("dow"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    spine = events.sparkSession.range(1, 8).select(F.col("id").cast("int").alias("dow"))
    # persist: 7 rows, but its lineage is the CORPUS-SIZED weekday
    # count — the totals and the output join would otherwise each
    # replay the full scan (3 scans in the compiled plan,
    # tools/rescan_audit.py; the calendar-index persist rationale,
    # including its per-call accumulation + clearCache() contract)
    dense = (
        spine.join(F.broadcast(counts), "dow", "left")
        .select(
            "dow",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        )
        .persist()
    )
    n_tot = dense.agg(F.sum("n_events").cast("long").alias("__n"))
    d7row = (
        F.lit(7).cast(dec) * F.col("n_events").cast(dec) - F.col("__n").cast(dec)
    )
    stats = (
        dense.crossJoin(F.broadcast(n_tot))
        .agg(
            F.max("__n").cast("long").alias("__n"),
            F.sum(d7row * d7row).alias("__x2"),
        )
    )
    j = dense.crossJoin(F.broadcast(stats))
    err = F.lit("weekday_profile: empty series (no non-NULL timestamps)")

    def g(col):
        return F.when(F.col("__n") > 0, col).otherwise(F.raise_error(err))

    return (
        j.select(
            "dow",
            "n_events",
            "__n",
            "__x2",
            (
                F.lit(7).cast(dec) * F.col("n_events").cast(dec)
                - F.col("__n").cast(dec)
            ).alias("__d7"),
        )
        .select(
            g(F.col("dow")).alias("dow"),
            g(F.col("n_events")).alias("n_events"),
            g(F.round(F.col("n_events") / F.col("__n"), 6)).alias("frac"),
            # e6_signed raises loudly if the *2e6 emit overflows 38
            # digits — a silent NULL under non-ANSI decimal otherwise
            g(e6_signed("__d7", "7 * __n", "weekday_profile")).alias("dev_e6"),
            g(e6_signed("__x2", "7 * __n", "weekday_profile")).alias("chi2_e6"),
        )
        .orderBy("dow")
    )


def mann_kendall_daily(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """EXACT Mann-Kendall trend test on daily event volume — the
    monotone-trend probe of the daily-monitor family (:func:`cusum_drift`
    finds a level SHIFT, :func:`acf_daily` a CYCLE; Mann-Kendall asks
    "is the series drifting up or down at all?" without assuming a
    shape)::

        S     = sum_{i<j} sgn(c_j - c_i)
        var18 = T(T-1)(2T+5) - sum_k t_k (t_k-1)(2 t_k+5)   (= 18*Var S)
        z     = (S - sgn(S)) / sqrt(var18 / 18)             (0 when S=0)

    with ``t_k`` the tie-group sizes of equal daily counts.  ``S`` and
    ``var18`` are exact int64 (bounded by T^3 over CALENDAR-day counts
    — tiny forever); ``z`` is correctly-rounded double ops over exact
    integers — identical on any engine — 6 dp.  ``z`` is NULL when
    ``var18 = 0`` (every calendar day has the same count: no rank
    order to trend — the hhi_norm convention; S is 0 there too).

    CALENDAR SEMANTICS: the acf_daily convention — the series runs
    over EVERY calendar day in ``[min_day, max_day]`` with zero-event
    days densified in; a trend over a has-events-only index would skip
    outages and bias S.  Empty series raises loudly on every output
    column (per-column guard over a global always-one-row aggregation).

    Plan: one day-keyed count (the ONLY corpus-sized work), calendar
    densify + row-number, one day-pair self-join (T^2/2 pairs of the
    CALENDAR-sized table — a year is ~66k pairs; days grow with time,
    never with corpus volume), tie groups a value-keyed count.

    Output: one row ``(n_days, s, var18, z)``.
    """
    idx = _calendar_daily_index(events, ts_col).select(
        "day", F.col("n_events").alias("n"), "__i"
    )
    a = idx.select(F.col("__i"), F.col("n").alias("__na"))
    b = idx.select(F.col("__i").alias("__j"), F.col("n").alias("__nb"))
    s_agg = (
        a.join(F.broadcast(b), F.col("__j") > F.col("__i"))
        .agg(
            F.sum(
                F.when(F.col("__nb") > F.col("__na"), 1)
                .when(F.col("__nb") < F.col("__na"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    ties = (
        idx.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("__tk"))
        .agg(
            F.sum(
                F.col("__tk") * (F.col("__tk") - 1) * (2 * F.col("__tk") + 5)
            )
            .cast("long")
            .alias("__tie18"),
        )
    )
    tot = idx.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    agg = tot.crossJoin(F.broadcast(s_agg)).crossJoin(F.broadcast(ties))
    t = F.col("n_days")
    var18 = (t * (t - 1) * (2 * t + 5) - F.col("__tie18")).cast("long")
    err = F.lit("mann_kendall_daily: empty series (no non-NULL timestamps)")

    def g(col):
        # per-column empty-series guard (the herfindahl pattern; the
        # global aggs always yield one row, so the raise is evaluable)
        return F.when(
            F.coalesce(F.col("n_days"), F.lit(0)) > 0, col
        ).otherwise(F.raise_error(err))

    z = F.when(
        var18 > 0,
        F.round(
            (
                F.col("s")
                - F.when(F.col("s") > 0, 1).when(F.col("s") < 0, -1).otherwise(0)
            ).cast("double")
            / F.sqrt(var18.cast("double") / F.lit(18.0)),
            6,
        ),
    )
    return agg.select(
        g(F.col("n_days")).alias("n_days"),
        g(F.coalesce(F.col("s"), F.lit(0))).alias("s"),
        g(var18).alias("var18"),
        g(z).alias("z"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order event-type transition matrix over per-user
    time-ordered streams — the Markov-chain view of user behavior
    ("what follows a click?") that complements :func:`st_funnel`'s
    fixed-sequence counting with the FULL empirical transition table.
    r14 registry candidate (the library-level-first modularity
    precedent).

    DETERMINISM CONTRACT: the per-user ordering is ``(ts, event_id)``
    — the id tie-break makes simultaneous events (same timestamp)
    order identically on any engine, so the transition pairs are
    bit-reproducible (the rounded-score-ordering lesson applied to
    window ordering).  NULL users/types/timestamps are dropped before
    pairing (a NULL would otherwise silently terminate a stream
    mid-way).  ``frac`` is ONE division of exact int64 counts
    (row-normalized: transitions out of ``from_type``), 6 dp.

    Plan: one lead window per user (the window key is the user —
    maximally fine-grained, no reducer hotspot), then a
    (from, to)-keyed count: the transition matrix is
    |types|^2-sized (metadata) at any corpus scale.

    Output: ``(from_type, to_type, n_transitions, frac)`` ordered by
    (from_type, to_type).
    """
    from pyspark.sql.window import Window

    base = events.filter(
        F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(ts_col).isNotNull()
    )
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        base.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    cnt = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    wf = Window.partitionBy("from_type")
    return (
        cnt.withColumn("__tot", F.sum("n_transitions").over(wf))
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("__tot"), 6).alias("frac"),
        )
        .orderBy("from_type", "to_type")
    )


def runs_test_daily(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Wald-Wolfowitz runs test on daily event volume — the
    randomness-of-sequence drift monitor that complements
    :func:`mann_kendall_daily` (MK asks "is there a monotone trend?";
    the runs test asks "do above/below-median days CLUSTER?" — a
    regime-switching feed fails runs long before it fails MK).  r15
    registry candidate.

    Each day is classified against the LOWER MEDIAN of the daily
    counts (smallest value whose cumulative day count reaches
    ceil(D/2) — the mad_lengths type-1 convention); median-equal days
    are DROPPED (the classical treatment).  With ``a`` above days,
    ``b`` below days, ``N = a + b`` and ``R`` observed runs::

        mu  = 1 + 2ab/N
        var = 2ab(2ab - N) / (N^2 (N - 1))
        z   = (R - mu) / sqrt(var)
            = (R*N - N - 2ab) * sqrt(N - 1) / sqrt(2ab(2ab - N))

    the second form is the IMPLEMENTED one: numerator and both sqrt
    arguments are exact integers (DECIMAL(38,0) for the products), so
    ``z`` is one multiply of a double by a correctly-rounded sqrt then
    one division by another — identical doubles on any engine (the
    mcc factored-sqrt device), 6 dp.  ``mu`` additionally emits as
    exact half-up microunits (``mu_e6`` via :func:`e6_signed`).  NULL
    z/mu when a = 0 or b = 0 (single-sign sequences carry no run
    signal) or when ``2ab = N`` (zero variance).

    Plan: one day-keyed count (the only corpus-sized work, shared via
    one persisted calendar-sized table), then value-grid median +
    day-ordered lag — all calendar-sized single-partition absorption
    (the cusum_drift contract).  NULL timestamps dropped.

    Output: one row ``(n_days, median, n_above, n_below, n_runs,
    mu_e6, z)``.
    """
    from pyspark.sql.window import Window

    from spatialdata_spark.functions.exact import e6_signed

    # persist: the calendar-sized daily table feeds the median rollup
    # AND the sign sequence (tools/rescan_audit.py class; per-call
    # accumulation + clearCache() contract as cusum_drift)
    daily = _daily_event_counts(events, ts_col).persist()
    vals = daily.groupBy(F.col("n_events").alias("__v")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    wv = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    med = (
        vals.select(
            "__v",
            F.sum("__c").over(wv).cast("long").alias("__cm"),
            F.sum("__c").over(
                Window.orderBy("__v").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("long")
            .alias("__d"),
        )
        .filter(F.col("__cm") >= F.floor((F.col("__d") + 1) / 2))
        .agg(
            F.min("__v").cast("long").alias("__med"),
            F.max("__d").cast("long").alias("__dtot"),
        )
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("n_events") != F.col("__med"))
        .select(
            "day",
            (F.col("n_events") > F.col("__med")).cast("long").alias("__s"),
        )
    )
    wd = Window.orderBy("day")
    seq = signs.select(
        "__s",
        F.when(F.lag("__s").over(wd).isNull(), F.lit(1))
        .when(F.col("__s") != F.lag("__s").over(wd), F.lit(1))
        .otherwise(F.lit(0))
        .alias("__new_run"),
    )
    agg = seq.agg(
        F.sum("__s").cast("long").alias("n_above"),
        F.sum(F.lit(1) - F.col("__s")).cast("long").alias("n_below"),
        F.coalesce(F.sum("__new_run"), F.lit(0)).cast("long").alias("n_runs"),
    )
    out = agg.crossJoin(F.broadcast(med.select("__med", "__dtot")))
    dec = "decimal(38,0)"
    a = F.col("n_above").cast(dec)
    b = F.col("n_below").cast(dec)
    nn = a + b
    r = F.col("n_runs").cast(dec)
    num = r * nn - nn - F.lit(2).cast(dec) * a * b
    b2 = (
        F.lit(2).cast(dec) * a * b
        * (F.lit(2).cast(dec) * a * b - nn)
    )
    mu_e6 = e6_signed(
        "CAST(n_above + n_below AS DECIMAL(38,0))"
        " + 2 * CAST(n_above AS DECIMAL(38,0)) * CAST(n_below AS DECIMAL(38,0))",
        "CAST(n_above + n_below AS DECIMAL(38,0))",
        "runs_test_daily",
    )
    ok = (F.col("n_above") > 0) & (F.col("n_below") > 0)
    return out.select(
        F.col("__dtot").alias("n_days"),
        F.col("__med").alias("median"),
        "n_above",
        "n_below",
        "n_runs",
        F.when(ok, mu_e6).alias("mu_e6"),
        F.when(
            ok & (b2 > 0),
            F.round(
                num.cast("double")
                * F.sqrt((nn - F.lit(1).cast(dec)).cast("double"))
                / F.sqrt(b2.cast("double")),
                6,
            ),
        ).alias("z"),
    )
