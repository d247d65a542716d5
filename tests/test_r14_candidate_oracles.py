"""Cross-engine dress rehearsal for the four r14 registry candidates
(the two-session pipeline: implement + pin + fuzz + smoke + DRAFT
oracle this round, register next round): run each library function on
Spark AND its draft DuckDB oracle on the same parquet, compare with the
driver-faithful ``tests.parity.compare``.

When r14 registers these, the SQL below moves into __spark_entry__
verbatim (q_promo_share's SQL already lives there, unregistered).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.parity import compare, duckdb_conn  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

MAD_LENGTHS_SQL = r"""
WITH f AS (
  SELECT source AS grp, CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1, 2
), cum AS (
  SELECT grp, v, CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cm,
         CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM f
), meds AS (
  SELECT grp, MAX(n) AS n_docs,
         MIN(CASE WHEN cm >= (n + 1) // 2 THEN v END) AS median
  FROM cum GROUP BY grp
), dev AS (
  SELECT f.grp, ABS(f.v - m.median) AS d, CAST(SUM(f.c) AS BIGINT) AS c
  FROM f JOIN meds m ON f.grp = m.grp GROUP BY 1, 2
), dcum AS (
  SELECT grp, d, CAST(SUM(c) OVER (PARTITION BY grp ORDER BY d) AS BIGINT) AS cm,
         CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM dev
), mads AS (
  SELECT grp, MIN(CASE WHEN cm >= (n + 1) // 2 THEN d END) AS mad
  FROM dcum GROUP BY grp
)
SELECT m.grp AS source, m.n_docs, m.median, mads.mad
FROM meds m JOIN mads USING (grp) ORDER BY source
"""

SIMPSON_SQL = r"""
WITH cells AS (
  SELECT source AS grp, lang AS cat, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2
), per AS (
  SELECT grp, CAST(SUM(c) AS BIGINT) AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_cats,
         SUM(CAST(c AS HUGEINT) * (c - 1)) AS num
  FROM cells GROUP BY grp
), sh AS (
  SELECT cells.grp,
         SUM(-(c / CAST(n_docs AS DOUBLE)) * ln(c / CAST(n_docs AS DOUBLE))) AS h
  FROM cells JOIN per USING (grp) GROUP BY cells.grp
)
SELECT per.grp AS source, n_docs, n_cats,
       CASE WHEN n_docs >= 2
            THEN CAST((num * 2000000 + CAST(n_docs AS HUGEINT) * (n_docs - 1))
                      // (CAST(n_docs AS HUGEINT) * (n_docs - 1) * 2) AS BIGINT)
       END AS simpson_e6,
       ROUND(h, 6) AS shannon,
       CASE WHEN n_cats > 1 THEN ROUND(h / ln(CAST(n_cats AS DOUBLE)), 6)
       END AS evenness
FROM per JOIN sh USING (grp) ORDER BY source
"""

# CROSS-ENGINE SHAPE CAVEAT (the ST_ACF_SQL / MANN_KENDALL_SQL
# precedent): on an EMPTY / all-NULL documents table this SQL returns
# one row of NULLs/zeros while kendall_tau raises 'empty input' loudly
# — a green one-row "match" from an empty partition would be a
# misread, not a pass.  Fixtures always carry documents, so the branch
# is never exercised by the driver.
KENDALL_TAU_SQL = r"""
WITH base AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(LEN(string_split_regex(LOWER(TRIM(text)), '\s+')) AS BIGINT) AS y
  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL
), cells AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
), xs AS (
  SELECT x, CAST(SUM(c) AS BIGINT) AS cx,
         ROW_NUMBER() OVER (ORDER BY x) AS ix
  FROM cells GROUP BY x
), ys AS (
  SELECT y, CAST(SUM(c) AS BIGINT) AS cy,
         ROW_NUMBER() OVER (ORDER BY y) AS iy
  FROM cells GROUP BY y
), dense AS (
  SELECT xs.ix, ys.iy, COALESCE(cells.c, 0) AS c
  FROM xs CROSS JOIN ys
  LEFT JOIN cells ON cells.x = xs.x AND cells.y = ys.y
), cum1 AS (
  SELECT ix, iy, SUM(c) OVER (PARTITION BY ix ORDER BY iy) AS cy2 FROM dense
), cum2 AS (
  SELECT ix, iy,
         CAST(SUM(cy2) OVER (PARTITION BY iy ORDER BY ix) AS BIGINT) AS c2d
  FROM cum1
), xpre AS (
  SELECT ix,
         CAST(COALESCE(SUM(cx) OVER (ORDER BY ix
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS txlt
  FROM xs
), rc AS (
  SELECT cells.c, xs.ix, ys.iy FROM cells JOIN xs USING (x) JOIN ys USING (y)
), j AS (
  SELECT rc.c,
         CAST(COALESCE(d11.c2d, 0) AS HUGEINT) AS tl,
         CAST(xpre.txlt AS HUGEINT) - COALESCE(d10.c2d, 0) AS td
  FROM rc
  LEFT JOIN cum2 d11 ON d11.ix = rc.ix - 1 AND d11.iy = rc.iy - 1
  LEFT JOIN cum2 d10 ON d10.ix = rc.ix - 1 AND d10.iy = rc.iy
  JOIN xpre ON xpre.ix = rc.ix
), pq AS (
  SELECT SUM(CAST(c AS HUGEINT) * tl) AS p, SUM(CAST(c AS HUGEINT) * td) AS q
  FROM j
), xa AS (
  SELECT CAST(SUM(cx) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_x_values,
         SUM(CAST(cx AS HUGEINT) * (cx - 1)) AS d1x2
  FROM xs
), ya AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_y_values,
         SUM(CAST(cy AS HUGEINT) * (cy - 1)) AS d2x2
  FROM ys
)
SELECT xa.n AS n_docs, xa.n_x_values, ya.n_y_values,
       CASE WHEN (CAST(xa.n AS HUGEINT) * (xa.n - 1) - xa.d1x2) > 0
             AND (CAST(xa.n AS HUGEINT) * (xa.n - 1) - ya.d2x2) > 0
            THEN ROUND(2.0 * CAST(pq.p - pq.q AS DOUBLE)
                 / (sqrt(CAST(CAST(xa.n AS HUGEINT) * (xa.n - 1) - xa.d1x2 AS DOUBLE))
                    * sqrt(CAST(CAST(xa.n AS HUGEINT) * (xa.n - 1) - ya.d2x2 AS DOUBLE))),
                 6)
       END AS kendall_tau
FROM xa CROSS JOIN ya CROSS JOIN pq
"""


TRIMMED_MEAN_SQL = r"""
WITH f AS (
  SELECT source AS grp, CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1, 2
), cum AS (
  SELECT grp, v, c,
         CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cm,
         CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM f
), k AS (
  SELECT grp, v, n,
         GREATEST(0, LEAST(cm, n - (5 * n) // 100)
                     - GREATEST(cm - c, (5 * n) // 100)) AS kept
  FROM cum
), agg AS (
  SELECT grp, MAX(n) AS n_docs, CAST(SUM(kept) AS BIGINT) AS n_kept,
         SUM(CAST(kept AS HUGEINT) * v) AS sum_kept
  FROM k GROUP BY grp
)
SELECT grp AS source, n_docs, n_kept,
       CASE WHEN sum_kept >= 0
            THEN CAST((sum_kept * 2000000 + n_kept) // (n_kept * 2) AS BIGINT)
            ELSE -CAST(((-sum_kept) * 2000000 + n_kept) // (n_kept * 2) AS BIGINT)
       END AS trimmed_mean_e6
FROM agg ORDER BY source
"""

YULE_K_SQL = r"""
WITH tok AS (
  SELECT t FROM (
    SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS t
    FROM documents
  ) WHERE t <> ''
), counts AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1
), agg AS (
  SELECT CAST(SUM(tf) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         SUM(CAST(tf AS HUGEINT) * tf) AS s2
  FROM counts
)
SELECT n_tokens, n_types,
       CAST(((s2 - n_tokens) * 10000 * 2000000
             + CAST(n_tokens AS HUGEINT) * n_tokens)
            // (CAST(n_tokens AS HUGEINT) * n_tokens * 2) AS BIGINT)
         AS yule_k_e6
FROM agg
"""


def _case(name):
    import __spark_entry__ as entrymod
    from spatialdata_spark.operators.temporal import event_transitions
    from spatialdata_spark.pipeline.textstats import (
        kendall_tau,
        mad_lengths,
        simpson_diversity,
        trimmed_mean_lengths,
        yule_k,
    )

    return {
        "mad_lengths": (
            lambda spark, sf: mad_lengths(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            MAD_LENGTHS_SQL,
        ),
        "simpson": (
            lambda spark, sf: simpson_diversity(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            SIMPSON_SQL,
        ),
        "kendall": (
            lambda spark, sf: kendall_tau(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            KENDALL_TAU_SQL,
        ),
        "promo_share": (entrymod.q_promo_share, entrymod.Q_PROMO_SHARE_SQL),
        "order_priority": (
            entrymod.q_order_priority,
            entrymod.Q_ORDER_PRIORITY_SQL,
        ),
        "idle_customers": (
            entrymod.q_idle_customers,
            entrymod.Q_IDLE_CUSTOMERS_SQL,
        ),
        "event_transitions": (
            lambda spark, sf: event_transitions(
                spark.read.parquet(f"{sf}/events.parquet")
            ),
            entrymod.ST_EVENT_TRANSITIONS_SQL,
        ),
        "trimmed_mean": (
            lambda spark, sf: trimmed_mean_lengths(
                spark.read.parquet(f"{sf}/documents.parquet"), trim_pct=5
            ),
            TRIMMED_MEAN_SQL,
        ),
        "yule_k": (
            lambda spark, sf: yule_k(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            YULE_K_SQL,
        ),
    }[name]


@pytest.mark.parametrize(
    "name",
    [
        "mad_lengths",
        "simpson",
        "kendall",
        "promo_share",
        "order_priority",
        "idle_customers",
        "event_transitions",
        "trimmed_mean",
        "yule_k",
    ],
)
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_r14_candidate_cross_engine(spark, name, sf_dir):
    fn, sql = _case(name)
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    odf = con.execute(sql).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, f"{name} @ {sf_dir}: {msg}"
