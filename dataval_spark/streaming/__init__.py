from dataval_spark.streaming.increment import increment_batch_writer
from dataval_spark.streaming.snapshot_sink import (
    audited_snapshot_batch_writer,
    snapshot_batch_writer,
    stream_to_snapshot,
)
from dataval_spark.streaming.validate_stream import (
    stateless_flags,
    windowed_partition_verdicts,
)

__all__ = [
    "stateless_flags",
    "windowed_partition_verdicts",
    "increment_batch_writer",
    "snapshot_batch_writer",
    "audited_snapshot_batch_writer",
    "stream_to_snapshot",
]
