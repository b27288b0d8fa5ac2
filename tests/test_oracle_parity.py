"""End-to-end oracle parity at sf0.001 — local emulation of the driver's
t2 correctness gate (every queries() entry vs its DuckDB oracle SQL)."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001
from tests.oracle_check import run_check


def _query_names():
    import __spark_entry__ as entrymod
    return sorted(entrymod.queries())


@pytest.mark.parametrize("name", _query_names())
def test_oracle_parity_sf0001(spark, name):
    results = run_check(spark, SF0001, only=[name])
    problems = results.get(name, [])
    assert not problems, f"{name}: {problems}"
