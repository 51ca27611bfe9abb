"""Every oracle-backed query must match DuckDB on the fixtures (the local
mirror of the driver's CORRECTNESS gate). Runs at sf0.001 for speed; the
driver runs the same comparison at sf0.01 — mirror that exactly with
SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 python -m pytest
tests/test_oracle_parity.py (catches scale-dependent rounding-boundary
hits that sf0.001 misses, e.g. avg() landing on a 6dp edge)."""

from __future__ import annotations

import os

import pytest

from fred_economic_data_pipeline_local_spark.plans import all_oracles, all_queries

from .conftest import SF_DIR as _DEFAULT_SF
from .oracle_utils import compare_query

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", _DEFAULT_SF)

ORACLE_NAMES = sorted(all_oracles())
ROWS_ONLY = sorted(set(all_queries()) - set(all_oracles()))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, name):
    compare_query(spark, name, SF_DIR)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
