"""Every oracle-backed query must match DuckDB on the fixtures (the local
mirror of the driver's CORRECTNESS gate). Runs at sf0.001 for speed; the
driver runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

from fred_economic_data_pipeline_local_spark.plans import all_oracles, all_queries

from .conftest import SF_DIR
from .oracle_utils import compare_query

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
