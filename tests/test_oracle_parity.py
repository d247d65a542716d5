"""Pytest wrapper over the DuckDB parity gate at sf0.001 (the smoke
scale): every queries() entry must match its oracle_sql() through
DuckDB — the local replica of the driver's correctness check."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity import run_parity  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_all_queries_match_oracle():
    results = run_parity(SF_DIR)
    failures = {k: msg for k, (ok, msg) in results.items() if not ok}
    assert not failures, f"parity failures: {failures}"
    assert len(results) >= 50
