"""Cross-engine dress rehearsal for the four r13 registry candidates
(the two-session pipeline: implement + pin + fuzz + smoke + DRAFT
oracle this round, register next round): run each library function on
Spark AND its draft DuckDB oracle on the same parquet, compare with the
driver-faithful ``tests.parity.compare``.

When r13 registers these, the SQL below moves into __spark_entry__
verbatim.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.parity import compare, duckdb_conn  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

SPEARMAN_SQL = r"""
WITH base AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(LEN(string_split_regex(LOWER(TRIM(text)), '\s+')) AS BIGINT) AS y
  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL
), cells AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy FROM base GROUP BY 1, 2
), xg AS (
  SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM cells GROUP BY 1
), yg AS (
  SELECT y, CAST(SUM(cxy) AS BIGINT) AS cy FROM cells GROUP BY 1
), xr AS (
  SELECT x, cx,
         CAST(2 * (SUM(cx) OVER (ORDER BY x) - cx) + cx + 1 AS BIGINT) AS r2x
  FROM xg
), yr AS (
  SELECT y, cy,
         CAST(2 * (SUM(cy) OVER (ORDER BY y) - cy) + cy + 1 AS BIGINT) AS r2y
  FROM yg
), xa AS (
  SELECT CAST(SUM(cx) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_x_values,
         SUM(CAST(cx AS HUGEINT) * r2x) AS a,
         SUM(CAST(cx AS HUGEINT) * r2x * r2x) AS b
  FROM xr
), ya AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_y_values,
         SUM(CAST(cy AS HUGEINT) * r2y) AS ay,
         SUM(CAST(cy AS HUGEINT) * r2y * r2y) AS by_
  FROM yr
), ca AS (
  SELECT SUM(CAST(cells.cxy AS HUGEINT) * xr.r2x * yr.r2y) AS c
  FROM cells JOIN xr USING (x) JOIN yr USING (y)
)
SELECT xa.n AS n_docs, xa.n_x_values, ya.n_y_values,
       CASE WHEN (xa.n * xa.b - xa.a * xa.a) > 0
             AND (xa.n * ya.by_ - ya.ay * ya.ay) > 0
            THEN ROUND(CAST(xa.n * ca.c - xa.a * ya.ay AS DOUBLE)
                       / (sqrt(CAST(xa.n * xa.b - xa.a * xa.a AS DOUBLE))
                          * sqrt(CAST(xa.n * ya.by_ - ya.ay * ya.ay AS DOUBLE))),
                       6)
       END AS spearman
FROM xa CROSS JOIN ya CROSS JOIN ca
"""

CHAO1_SQL = r"""
WITH tok AS (
  SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
  FROM documents
), counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(tf) AS BIGINT) AS total_tokens,
         CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM counts
)
SELECT n_types, total_tokens, f1, f2,
       CAST((num * 2000000 + den) // (den * 2) AS BIGINT) AS chao1_e6
FROM (
  SELECT n_types, total_tokens, f1, f2,
         CAST(n_types AS HUGEINT) * (2 * (f2 + 1))
           + CAST(f1 AS HUGEINT) * (f1 - 1) AS num,
         CAST(2 * (f2 + 1) AS HUGEINT) AS den
  FROM agg
)
"""

MANN_KENDALL_SQL = r"""
-- CROSS-ENGINE SHAPE CAVEAT (realized-data-path oracle convention, the
-- ST_ACF_SQL precedent): on an EMPTY / all-NULL-ts events table this
-- SQL returns ONE row (n_days=0, s=0, var18=0, z NULL) while the Spark
-- mann_kendall_daily raises 'empty series' loudly — a green one-row
-- "match" from an empty partition would be a misread, not a pass.  The
-- parity fixtures always have events, so the divergence is never
-- exercised.
WITH counts AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), calendar AS (
  SELECT strftime(CAST(unnest(generate_series(
           CAST((SELECT MIN(day) FROM counts) AS DATE),
           CAST((SELECT MAX(day) FROM counts) AS DATE),
           INTERVAL 1 DAY)) AS DATE), '%Y-%m-%d') AS day
), daily AS (
  SELECT calendar.day, COALESCE(counts.n_events, 0) AS n
  FROM calendar LEFT JOIN counts USING (day)
), idx AS (
  SELECT n, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i FROM daily
), sr AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN b.n > a.n THEN 1
                                WHEN b.n < a.n THEN -1 ELSE 0 END), 0)
              AS BIGINT) AS s
  FROM idx a JOIN idx b ON b.i > a.i
), ties AS (
  SELECT CAST(COALESCE(SUM(tk * (tk - 1) * (2 * tk + 5)), 0) AS BIGINT) AS tie18
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tk FROM idx GROUP BY n)
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM idx)
SELECT n_days, s, var18,
       CASE WHEN var18 > 0
            THEN ROUND(CAST(s - (CASE WHEN s > 0 THEN 1
                                      WHEN s < 0 THEN -1 ELSE 0 END) AS DOUBLE)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6)
       END AS z
FROM (
  SELECT tot.n_days, sr.s,
         CAST(tot.n_days * (tot.n_days - 1) * (2 * tot.n_days + 5)
              - ties.tie18 AS BIGINT) AS var18
  FROM tot CROSS JOIN sr CROSS JOIN ties
)
"""


VOCAB_OVERLAP_SQL = r"""
WITH toks AS (
  SELECT DISTINCT source AS g,
         unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS tok
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), toks2 AS (
  SELECT g, tok FROM toks WHERE tok <> ''
), per AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS v FROM toks2 GROUP BY 1
), inter AS (
  SELECT a.g AS s1, b.g AS s2, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM toks2 a JOIN toks2 b ON a.tok = b.tok AND a.g < b.g
  GROUP BY 1, 2
)
SELECT s1, s2, pa.v AS n_a_types, pb.v AS n_b_types, n_common,
       ROUND(n_common / CAST(pa.v + pb.v - n_common AS DOUBLE), 9) AS jaccard
FROM inter
JOIN per pa ON pa.g = inter.s1
JOIN per pb ON pb.g = inter.s2
ORDER BY s1, s2
"""

LENGTH_QUANTILES_SQL = r"""
WITH f AS (
  SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1, 2
), cum AS (
  SELECT grp, v,
         CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cm,
         CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM f
)
SELECT grp, MAX(n) AS n_docs,
       MIN(CASE WHEN cm >= (50 * n + 99) // 100 THEN v END) AS p50,
       MIN(CASE WHEN cm >= (90 * n + 99) // 100 THEN v END) AS p90,
       MIN(CASE WHEN cm >= (99 * n + 99) // 100 THEN v END) AS p99
FROM cum
GROUP BY grp
ORDER BY grp
"""


def _spark_fn(name):
    import __spark_entry__ as entrymod
    from spatialdata_spark.operators.temporal import mann_kendall_daily
    from spatialdata_spark.pipeline.textstats import (
        chao1_richness,
        length_quantiles_exact,
        spearman_corr,
        vocab_overlap_exact,
    )

    return {
        "vocab_overlap": (
            lambda spark, sf: vocab_overlap_exact(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            VOCAB_OVERLAP_SQL,
        ),
        "length_quantiles": (
            lambda spark, sf: length_quantiles_exact(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            LENGTH_QUANTILES_SQL,
        ),
        "rfm": (entrymod.q_rfm_segments, entrymod.Q_RFM_SEGMENTS_SQL),
        "spearman": (
            lambda spark, sf: spearman_corr(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            SPEARMAN_SQL,
        ),
        "chao1": (
            lambda spark, sf: chao1_richness(
                spark.read.parquet(f"{sf}/documents.parquet")
            ),
            CHAO1_SQL,
        ),
        "mann_kendall": (
            lambda spark, sf: mann_kendall_daily(
                spark.read.parquet(f"{sf}/events.parquet")
            ),
            MANN_KENDALL_SQL,
        ),
    }[name]


@pytest.mark.parametrize(
    "name",
    ["rfm", "spearman", "chao1", "mann_kendall", "vocab_overlap", "length_quantiles"],
)
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_r13_candidate_cross_engine(spark, name, sf_dir):
    fn, sql = _spark_fn(name)
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    odf = con.execute(sql).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, f"{name} @ {sf_dir}: {msg}"
