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


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path_factory
):
    """Outer join semantics over a real two-batch file stream: matched
    clicks pair eagerly; clicks with no purchase inside max_delay emit
    with NULL purchase columns once a later batch advances the
    watermark past their window."""
    import time as _time

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from etl_onprem_to_cloud_spark.streaming import (
        click_purchase_attribution_outer,
        stream_events,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(batch):
        return spark.createDataFrame(batch, schema)

    d = str(tmp_path_factory.mktemp("outer_join_events"))
    # batch 1: user 1 click->purchase inside 10 min; user 2 click only.
    rows(
        [
            (1, t0, 1, "click", None),
            (2, t0 + dt.timedelta(minutes=5), 1, "purchase", 9.0),
            (3, t0, 2, "click", None),
        ]
    ).coalesce(1).write.mode("append").parquet(d)
    _time.sleep(1.1)  # distinct mtime -> file order == batch order
    # batch 2: far-future event advances BOTH watermarks hours past
    # batch 1, closing user 2's click window.
    rows(
        [
            (4, t0 + dt.timedelta(hours=12), 3, "click", None),
            (5, t0 + dt.timedelta(hours=12), 3, "purchase", 1.0),
        ]
    ).coalesce(1).write.mode("append").parquet(d)

    src = stream_events(spark, d, schema, max_files_per_trigger=1)
    out = click_purchase_attribution_outer(
        src.filter(F.col("event_type") == "click"),
        src.filter(F.col("event_type") == "purchase"),
        max_delay="10 minutes",
        watermark="30 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ss_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM ss_outer").collect()
    }
    assert (1, 2) in got, "matched click must pair with its purchase"
    assert (3, None) in got, (
        "unmatched click must emit with NULL purchase after the "
        "watermark passed its window"
    )
