"""Cross-engine rehearsal for the nine r14 registrations — now pinned
against the REGISTERED oracles (round 13 banked these with draft SQL in
this file; round 14 moved the SQL verbatim into
``__spark_entry__.oracle_sql()``, and this test keeps the two-SF
cross-engine check alive while also pinning that registration happened:
a missing key or a drifted oracle fails here before the driver sees it).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.parity import compare, duckdb_conn  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

R14_KEYS = [
    "q_promo_share",
    "q_order_priority",
    "q_idle_customers",
    "pl_mad_lengths",
    "pl_simpson_diversity",
    "pl_kendall_tau",
    "pl_trimmed_mean",
    "pl_yule_k",
    "st_event_transitions",
]


@pytest.mark.parametrize("name", R14_KEYS)
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_r14_registration_cross_engine(spark, name, sf_dir):
    import __spark_entry__ as em

    q = em.queries()
    o = em.oracle_sql()
    assert name in q, f"{name} missing from queries()"
    assert name in o, f"{name} missing from oracle_sql()"
    # (the head-50 membership assertion was r14-only: these rows
    # rotated out of the driver head at r15 per the rotation rule, but
    # stay registered and cross-engine-checked here)
    sdf = q[name](spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    odf = con.execute(o[name]).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, f"{name} @ {sf_dir}: {msg}"
