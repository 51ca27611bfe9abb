"""End-to-end two-phase JDBC upsert against embedded Derby (VERDICT r1
item 8): the staging write goes through Spark's parallel JDBC writer, the
merge runs server-side in one transaction, and the final table state must
equal the engine-side ``upsert_merge`` oracle op on the same inputs.

Derby ships with Spark (jars/derby-*.jar) and supports ANSI MERGE, so
this exercises the real ``jdbc_upsert`` code path — connection handling,
staging overwrite, transactional execute — not just the generated SQL.
"""

from __future__ import annotations

import pytest

from fred_economic_data_pipeline_local_spark.operators.serve import upsert_merge
from fred_economic_data_pipeline_local_spark.sources.serving import (
    build_merge_sql,
    jdbc_upsert,
    read_jdbc,
)

_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _connect(spark, url: str):
    jvm = spark._jvm
    jvm.java.lang.Class.forName(_PROPS["driver"])
    return jvm.java.sql.DriverManager.getConnection(url)


def _exec(spark, url: str, sql: str) -> None:
    conn = _connect(spark, url)
    try:
        conn.createStatement().execute(sql)
    finally:
        conn.close()


@pytest.fixture()
def derby_url(request, spark):
    # unique in-memory db per test; Derby keeps memory dbs for the JVM's
    # lifetime, so reuse of a name would leak state across tests
    name = request.node.name.replace("[", "_").replace("]", "_")
    url = f"jdbc:derby:memory:{name};create=true"
    _connect(spark, url).close()
    return url


def test_two_phase_upsert_matches_engine_merge(spark, derby_url):
    cols = '"obs_date" VARCHAR(10), "indicator" VARCHAR(16), "value" DOUBLE'
    _exec(spark, derby_url, f'CREATE TABLE "ECON" ({cols})')

    schema = "obs_date string, indicator string, value double"
    existing = spark.createDataFrame(
        [("2024-01-01", "GDP", 1.0), ("2024-02-01", "GDP", 2.0)], schema
    )
    incoming = spark.createDataFrame(
        [("2024-02-01", "GDP", 20.0), ("2024-03-01", "GDP", 3.0)], schema
    )

    # seed the serving table with the existing rows (plain insert)
    conn = _connect(spark, derby_url)
    try:
        st = conn.prepareStatement('INSERT INTO "ECON" VALUES (?, ?, ?)')
        for d, i, v in existing.collect():
            st.setString(1, d)
            st.setString(2, i)
            st.setDouble(3, v)
            st.executeUpdate()
    finally:
        conn.close()

    executed = jdbc_upsert(
        incoming,
        derby_url,
        "ECON",
        key_columns=["obs_date", "indicator"],
        properties=_PROPS,
        staging_table="ECON_STAGING",
        dialect="merge",
        staging_options={
            "createTableColumnTypes": "obs_date VARCHAR(10), indicator VARCHAR(16)"
        },
    )
    assert executed == build_merge_sql(
        "ECON", ["obs_date", "indicator", "value"], ["obs_date", "indicator"],
        "ECON_STAGING",
    )

    back = read_jdbc(
        spark,
        derby_url,
        'SELECT "obs_date", "indicator", "value" FROM "ECON"',
        _PROPS,
    )
    expected = upsert_merge(
        existing, incoming, keys=["obs_date", "indicator"]
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_upsert_is_idempotent_on_rerun(spark, derby_url):
    _exec(
        spark,
        derby_url,
        'CREATE TABLE "ECON" ("obs_date" VARCHAR(10), "indicator" VARCHAR(16),'
        ' "value" DOUBLE)',
    )
    schema = "obs_date string, indicator string, value double"
    incoming = spark.createDataFrame(
        [("2024-01-01", "GDP", 1.0), ("2024-02-01", "GDP", 2.0)], schema
    )
    for _ in range(2):  # re-running the same batch must not duplicate rows
        jdbc_upsert(
            incoming,
            derby_url,
            "ECON",
            key_columns=["obs_date", "indicator"],
            properties=_PROPS,
            staging_table="ECON_STAGING",
            dialect="merge",
            staging_options={
                "createTableColumnTypes": "obs_date VARCHAR(10), indicator VARCHAR(16)"
            },
        )
    back = read_jdbc(
        spark, derby_url, 'SELECT "obs_date", "value" FROM "ECON"', _PROPS
    )
    assert sorted(map(tuple, back.collect())) == [
        ("2024-01-01", 1.0),
        ("2024-02-01", 2.0),
    ]
