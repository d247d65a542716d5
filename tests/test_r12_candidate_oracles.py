"""Cross-engine dress rehearsal for the four r12 registry candidates:
run each library function on Spark AND its DRAFT DuckDB oracle on the
same parquet, compare with the driver-faithful `tests.parity.compare`.

This de-risks the r12 registration step NOW — especially the ln-based
statistics (theil, mutual information), where an engine-libm last-ulp
difference would only surface at the cross-engine hash.  When r12
registers these, the SQL below moves into __spark_entry__ verbatim.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.parity import compare, duckdb_conn  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

CVM_SQL = r"""
WITH f AS (
  SELECT n_chars AS val, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia
  FROM documents WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
), counts AS (
  SELECT val, CAST(SUM(ia) AS BIGINT) AS ca, CAST(SUM(1 - ia) AS BIGINT) AS cb
  FROM f GROUP BY 1
), cum AS (
  SELECT ca, cb,
         CAST(SUM(ca) OVER (ORDER BY val) AS BIGINT) AS cuma,
         CAST(SUM(cb) OVER (ORDER BY val) AS BIGINT) AS cumb
  FROM counts
), tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
  FROM counts
), agg AS (
  SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
         SUM(CAST(ca + cb AS HUGEINT)
             * (CAST(cuma AS HUGEINT) * n_b - CAST(cumb AS HUGEINT) * n_a)
             * (CAST(cuma AS HUGEINT) * n_b - CAST(cumb AS HUGEINT) * n_a)
         ) AS num
  FROM cum CROSS JOIN tot
)
SELECT n_a, n_b,
       CAST((num * 2000000 + den) // (den * 2) AS BIGINT) AS cvm_e6
FROM (
  SELECT n_a, n_b, num,
         CAST(n_a AS HUGEINT) * n_b * (n_a + n_b) * (n_a + n_b) AS den
  FROM agg
)
"""

WEEKDAY_SQL = r"""
WITH counts AS (
  SELECT CAST(isodow(ts) AS INT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), spine AS (
  SELECT CAST(unnest(range(1, 8)) AS INT) AS dow
), dense AS (
  SELECT spine.dow, COALESCE(counts.n_events, 0) AS n_events
  FROM spine LEFT JOIN counts USING (dow)
), n1 AS (
  SELECT CAST(SUM(n_events) AS HUGEINT) AS n FROM dense
), stats AS (
  SELECT MAX(n1.n) AS n,
         SUM((7 * CAST(dense.n_events AS HUGEINT) - n1.n)
             * (7 * CAST(dense.n_events AS HUGEINT) - n1.n)) AS x2
  FROM dense CROSS JOIN n1
)
SELECT dow, n_events,
       ROUND(n_events / CAST(n AS DOUBLE), 6) AS frac,
       CASE WHEN d7 >= 0
            THEN CAST((d7 * 2000000 + 7 * n) // (14 * n) AS BIGINT)
            ELSE -CAST(((-d7) * 2000000 + 7 * n) // (14 * n) AS BIGINT)
       END AS dev_e6,
       CAST((x2 * 2000000 + 7 * n) // (14 * n) AS BIGINT) AS chi2_e6
FROM (
  SELECT dense.dow, dense.n_events, stats.n, stats.x2,
         7 * CAST(dense.n_events AS HUGEINT) - stats.n AS d7
  FROM dense CROSS JOIN stats
)
ORDER BY dow
"""

THEIL_SQL = r"""
WITH per AS (
  SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents WHERE source IS NOT NULL GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM per
), t AS (
  -- mirror the Spark float op order exactly: (c/n) * ln((c*k)/n),
  -- each division one double op over exact int64 inputs
  SELECT SUM((c / CAST(n AS DOUBLE)) * ln((c * k) / CAST(n AS DOUBLE))) AS theil_raw
  FROM per CROSS JOIN tot
)
SELECT tot.n AS n_docs, tot.k AS n_groups,
       ROUND(t.theil_raw, 6) AS theil,
       CASE WHEN tot.k > 1
            THEN ROUND(t.theil_raw / ln(CAST(tot.k AS DOUBLE)), 6)
       END AS theil_norm
FROM tot CROSS JOIN t
"""

MI_SQL = r"""
WITH cells AS (
  SELECT source AS r, lang AS c, CAST(COUNT(*) AS BIGINT) AS cn
  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2
), rm AS (SELECT r, CAST(SUM(cn) AS BIGINT) AS nr FROM cells GROUP BY 1),
cm AS (SELECT c, CAST(SUM(cn) AS BIGINT) AS nc FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(SUM(cn) AS BIGINT) AS N,
         CAST(COUNT(DISTINCT r) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT c) AS BIGINT) AS n_cols
  FROM cells
), mi AS (
  SELECT SUM((cn / CAST(N AS DOUBLE))
             * ln((cn * N) / CAST(nr * nc AS DOUBLE))) AS mi_raw
  FROM cells
  JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot
), hr AS (
  SELECT SUM(-(nr / CAST(N AS DOUBLE)) * ln(nr / CAST(N AS DOUBLE))) AS hr_raw
  FROM rm CROSS JOIN tot
), hc AS (
  SELECT SUM(-(nc / CAST(N AS DOUBLE)) * ln(nc / CAST(N AS DOUBLE))) AS hc_raw
  FROM cm CROSS JOIN tot
)
SELECT tot.N AS n_docs, tot.n_rows, tot.n_cols,
       ROUND(mi.mi_raw, 6) AS mi,
       ROUND(hr.hr_raw, 6) AS h_row,
       ROUND(hc.hc_raw, 6) AS h_col,
       CASE WHEN hr.hr_raw > 0 AND hc.hc_raw > 0
            THEN ROUND(mi.mi_raw / (sqrt(hr.hr_raw) * sqrt(hc.hc_raw)), 6)
       END AS nmi
FROM tot CROSS JOIN mi CROSS JOIN hr CROSS JOIN hc
"""


def _spark_fn(name):
    import __spark_entry__ as entrymod
    from spatialdata_spark.operators.temporal import weekday_profile
    from spatialdata_spark.pipeline.textstats import (
        cramer_von_mises_2sample,
        mutual_information,
        theil_index,
    )

    return {
        "revenue_growth": (
            entrymod.q_revenue_growth,
            entrymod.Q_REVENUE_GROWTH_SQL,
        ),
        "cvm": (
            lambda spark, sf: cramer_von_mises_2sample(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            CVM_SQL,
        ),
        "weekday": (
            lambda spark, sf: weekday_profile(
                spark.read.parquet(f"{sf}/events.parquet")
            ),
            WEEKDAY_SQL,
        ),
        "theil": (
            lambda spark, sf: theil_index(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            THEIL_SQL,
        ),
        "mi": (
            lambda spark, sf: mutual_information(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            MI_SQL,
        ),
    }[name]


@pytest.mark.parametrize("name", ["cvm", "weekday", "theil", "mi", "revenue_growth"])
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_r12_candidate_cross_engine(spark, name, sf_dir):
    fn, sql = _spark_fn(name)
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    odf = con.execute(sql).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, f"{name} @ {sf_dir}: {msg}"
