"""Stream-stream join: the watermarked interval join over two real
file-source streams must converge to the identical batch-mode result."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_onprem_to_cloud_spark.sources import load_table
from etl_onprem_to_cloud_spark.streaming import (
    click_purchase_attribution_stream,
    stream_events,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ss_join_events"))
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_stream_join_matches_batch(spark, events_batch, events_stream_dir):
    # the replay files are NOT time-ordered (repartition scatters event
    # times across files), so a watermark would legitimately drop rows
    # the batch twin keeps; inner joins allow unwatermarked state.
    src = stream_events(spark, events_stream_dir, events_batch.schema)
    joined = click_purchase_attribution_stream(
        src.filter(F.col("event_type") == "click"),
        src.filter(F.col("event_type") == "purchase"),
        max_delay="1 hour",
        watermark=None,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM ss_join").collect())
    )

    want = sorted(
        map(
            tuple,
            click_purchase_attribution_stream(
                events_batch.filter(F.col("event_type") == "click"),
                events_batch.filter(F.col("event_type") == "purchase"),
                max_delay="1 hour",
                watermark=None,
            ).collect(),
        )
    )
    assert len(want) > 0, "fixture produced no click->purchase pairs"
    assert got == want


def test_stream_stream_join_bounds_state(spark, events_batch, events_stream_dir):
    # every output purchase must be within the delay window of its click
    src = stream_events(spark, events_stream_dir, events_batch.schema)
    joined = click_purchase_attribution_stream(
        src.filter(F.col("event_type") == "click"),
        src.filter(F.col("event_type") == "purchase"),
        max_delay="30 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_bound")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    bad = spark.sql(
        """SELECT count(*) AS n FROM ss_join_bound
           WHERE purchase_ts < click_ts
              OR purchase_ts > click_ts + INTERVAL 30 MINUTES"""
    ).first()["n"]
    assert bad == 0
