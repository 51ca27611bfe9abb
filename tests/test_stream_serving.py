"""Streaming -> serving composition: an update-mode aggregation streamed
through foreachBatch into a live (embedded Derby) keyed MERGE must end in
the same table state as the batch aggregation — across multiple
micro-batches, with only changed keys flowing per batch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.sources.serving import jdbc_upsert
from fred_economic_data_pipeline_local_spark.streaming.windows import (
    stream_upsert_sink,
)

from .test_jdbc_derby import _PROPS, _connect, _exec

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_counts_merge_into_derby(spark, tmp_path):
    url = "jdbc:derby:memory:streamserve;create=true"
    _connect(spark, url).close()
    _exec(
        spark,
        url,
        'CREATE TABLE "USERCOUNTS" ("user_id" BIGINT, "cnt" BIGINT)',
    )

    # split the fixture into several files so AvailableNow produces
    # multiple micro-batches, each merging its delta
    src = str(tmp_path / "events_split")
    spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "user_id"
    ).repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    batches = []

    def upsert(batch_df, batch_id):
        batches.append(batch_id)
        jdbc_upsert(
            batch_df,
            url,
            "USERCOUNTS",
            key_columns=["user_id"],
            properties=_PROPS,
            staging_table="USERCOUNTS_STAGING",
            dialect="merge",
        )

    stream_upsert_sink(stream, upsert)
    assert len(batches) > 1  # genuinely incremental, not one big batch

    got = {
        (r[0], r[1])
        for r in spark.read.jdbc(url, '"USERCOUNTS"', properties=_PROPS).collect()
    }
    expected = {
        (r.user_id, r.cnt)
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected
