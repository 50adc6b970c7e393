"""Structured-Streaming validation: drive a real streaming query from
parquet files through the stateless flag projection + watermarked
windowed verdicts into a memory sink."""

from __future__ import annotations

import pytest

from dataval_spark.fixtures import transcripts
from dataval_spark.streaming.validate_stream import (
    stateless_flags,
    windowed_partition_verdicts,
)
from dataval_spark.suite import transcript_suite


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_input"))
    transcripts(spark, n_convs=200, seed=2187, n_parts=4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_streaming_flags_match_batch(spark, stream_dir):
    batch = spark.read.parquet(stream_dir)
    schema = batch.schema
    suite = transcript_suite()

    stream = spark.readStream.schema(schema).parquet(stream_dir)
    flagged = stateless_flags(suite, stream)
    agg = windowed_partition_verdicts(flagged, window="1 hour", watermark="2 hours")

    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("verdicts_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT sum(n_rows) AS n, sum(n_approved) AS a FROM verdicts_stream"
        ).collect()[0]
    finally:
        q.stop()

    expected_flagged = stateless_flags(suite, batch)
    exp_n = expected_flagged.count()
    exp_a = expected_flagged.where("approved").count()
    assert got.n == exp_n
    assert got.a == exp_a
