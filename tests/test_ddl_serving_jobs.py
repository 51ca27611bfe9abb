"""DDL catalog ops (D1-D5), serving-edge SQL/append, and the catalog-driven
job runner (the Airflow DAG factory replacement)."""

from __future__ import annotations

import pytest

from fred_economic_data_pipeline_local_spark.jobs import (
    SeriesConfig,
    load_catalog,
    run_catalog,
    run_series,
)
from fred_economic_data_pipeline_local_spark.operators.ddl import (
    add_columns,
    create_table,
    rename_columns,
    table_schema,
    truncate_table,
)
from fred_economic_data_pipeline_local_spark.sources.extract import replay_fetcher
from fred_economic_data_pipeline_local_spark.sources.serving import (
    build_upsert_sql,
    sheet_append_delta,
)


@pytest.fixture()
def ddl_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS ddl_test LOCATION '{tmp_path}/wh'")
    yield "ddl_test"
    spark.sql("DROP DATABASE IF EXISTS ddl_test CASCADE")


def test_ddl_lifecycle(spark, ddl_db):
    t = f"{ddl_db}.obs"
    create_table(
        spark, t,
        {"indicator": "string", "yr": "int", "val": "double"},
        partition_by=["indicator"],
    )
    assert [f.name for f in table_schema(spark, t).fields] == ["yr", "val", "indicator"]

    add_columns(spark, t, {"note": "string"})
    assert "note" in [f.name for f in table_schema(spark, t).fields]

    rename_columns(spark, t, {"yr": "observation_year"})
    assert "observation_year" in [f.name for f in table_schema(spark, t).fields]

    spark.sql(f"INSERT INTO {t} VALUES (2024, 1.5, 'x', 'UNRATE')")
    assert spark.table(t).count() == 1
    truncate_table(spark, t)
    assert spark.table(t).count() == 0


def test_ddl_rejects_injection(spark):
    with pytest.raises(ValueError):
        create_table(spark, "t; DROP TABLE x", {"a": "int"})
    with pytest.raises(ValueError):
        build_upsert_sql('t"," ', ["a"], ["a"])


def test_upsert_sql_matches_reference_shape():
    """Pinned to load_fred_data.py:54-59: conflict on the 3-part key,
    every non-key column updated from EXCLUDED."""
    sql = build_upsert_sql(
        "economic_indicators",
        ["indicator", "observation_year", "observation_month", "value",
         "observation_count", "ingested_at", "processed_at", "aggregated_at"],
        ["indicator", "observation_year", "observation_month"],
        staging_table="economic_indicators_staging",
    )
    assert 'ON CONFLICT ("indicator", "observation_year", "observation_month")' in sql
    assert '"value" = EXCLUDED."value"' in sql
    assert '"aggregated_at" = EXCLUDED."aggregated_at"' in sql
    assert '"indicator" = EXCLUDED' not in sql  # keys never updated
    assert sql.startswith('INSERT INTO "economic_indicators"')
    assert 'FROM "economic_indicators_staging"' in sql


def test_sheet_append_delta_collects_only_delta(spark):
    incoming = spark.createDataFrame(
        [("UNRATE", 2024, 1, 3.5), ("UNRATE", 2024, 2, 3.6)],
        "indicator string, observation_year int, observation_month int, value double",
    )
    existing = spark.createDataFrame(
        [("UNRATE", "2024", "1")],
        "indicator string, observation_year string, observation_month string",
    )
    appended: list[list] = []
    n = sheet_append_delta(
        incoming, existing,
        ["indicator", "observation_year", "observation_month"],
        appended.extend,
    )
    assert n == 1
    assert appended == [["UNRATE", 2024, 2, 3.6]]


CATALOG_YAML = """
indicators:
  - series_id: UNRATE
    name: Unemployment Rate
    start_date: "2024-01-01"
    end_date: "2024-02-29"
    table_name: economic_indicators
    sheet_name: FRED_data
"""


def test_run_catalog_end_to_end(spark, tmp_path):
    cat = tmp_path / "catalog.yaml"
    cat.write_text(CATALOG_YAML)
    cfgs = load_catalog(str(cat))
    assert cfgs == [
        SeriesConfig("UNRATE", "Unemployment Rate", "2024-01-01", "2024-02-29",
                     "economic_indicators", "FRED_data")
    ]

    fetcher = replay_fetcher(
        {
            ("2024-01-01", "2024-01-31"): [
                {"date": "2024-01-02", "value": "3.5"},
                {"date": "2024-01-09", "value": "3.7"},
                {"date": "2024-01-16", "value": "."},
            ],
            ("2024-02-01", "2024-02-29"): [{"date": "2024-02-06", "value": "4.1"}],
        }
    )
    counts = run_catalog(spark, str(cat), str(tmp_path / "lake"), fetcher)
    assert counts == {"UNRATE": {"bronze": 4, "silver": 2, "gold": 2}}

    # idempotent re-run: same window, same results (overwrite semantics)
    counts2 = run_series(
        spark, cfgs[0], str(tmp_path / "lake"), fetcher
    )
    assert counts2 == {"bronze": 4, "silver": 2, "gold": 2}


def test_run_curation_job_idempotent(spark, tmp_path):
    """The curation job writes a split-partitioned lake, counts match the
    inline pipeline, and a re-run replaces (not duplicates) the output."""
    from fred_economic_data_pipeline_local_spark.jobs import (
        CurationConfig,
        run_curation_job,
    )

    out = str(tmp_path / "curated")
    docs_path = "/root/testdata/sf0.001/documents.parquet"
    counts1 = run_curation_job(spark, docs_path, out)
    assert set(counts1) <= {"train", "val", "test", "benchmark"}
    assert sum(counts1.values()) > 0
    # the held-out eval rows are accounted for, not silently dropped
    assert counts1.get("benchmark", 0) > 0
    # layout: Hive-partitioned by split
    import os

    assert any(d.startswith("split=") for d in os.listdir(out))
    # idempotent re-run: same counts, no duplication
    counts2 = run_curation_job(spark, docs_path, out)
    assert counts2 == counts1
    # docs never leak across splits on re-run (content-hash assignment)
    df = spark.read.parquet(out)
    assert df.select("doc_id").distinct().count() == df.count()
    # tighter config gates more docs out
    strict = run_curation_job(
        spark, docs_path, str(tmp_path / "strict"), CurationConfig(min_tokens=40)
    )
    assert sum(strict.values()) < sum(counts1.values())
