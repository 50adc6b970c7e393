"""Continuous-crawl dedup: wire ``operators.incremental.dedup_increment``
into Structured Streaming — each micro-batch dedups against the
persistent signature store, writes its survivors, and appends their
signatures so the NEXT batch sees them.

    stream = spark.readStream.schema(sch).parquet(crawl_dir)
    q = (stream.writeStream
         .foreachBatch(increment_batch_writer(store, out))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())

Exactly-once contract (same discipline as
streaming/validate_stream.manifest_batch_writer): Structured Streaming
re-invokes foreachBatch with the SAME batch_id when a crash lands
between the writes and the checkpoint commit, so

* both outputs are ``batch=<key>``-scoped directory writes with
  overwrite (the manifest_batch_writer pattern) — a re-executed batch
  REPLACES exactly its own directory, never appends a duplicate and
  never touches another batch's files. A directory write (not dynamic
  partition overwrite of a ``batch`` column) because a re-execution
  that keeps ZERO docs must still clear its previous attempt's output:
  dynamic overwrite of an empty frame writes no partitions and would
  leave the stale files in place;
* the store read for batch B filters out B's own partition — a
  re-executed batch must not see the delta its crashed attempt already
  wrote (it would drop every one of its docs as "already accepted" and
  replace its kept output with an empty frame). The exclusion is a
  partition-pruned predicate, not file listing, so it works identically
  on any store filesystem.

Ordering: micro-batches of one streaming query execute serially, which
is exactly the arrival-order greedy-online contract documented in
operators/incremental.py. Running several concurrent queries against
one store forfeits that ordering (store rows still compose, but
cross-batch near-dup chains resolve nondeterministically).

Store maintenance: the store accretes one partition per batch; for
frequent tiny batches, periodically rewrite many small partitions into
one (content is append-only and keyed, so compaction is a pure
rewrite); with an Iceberg catalog the TableIO seam replaces the
partition game with real snapshot appends.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataval_spark.operators.incremental import dedup_increment

__all__ = [
    "STORE_SCHEMA_BATCHED",
    "increment_key",
    "read_store",
    "increment_batch_writer",
]

STORE_SCHEMA_BATCHED = "fp string, code long, batch string"


def increment_key(run_id: str, batch_id: int) -> str:
    """The ``batch=`` directory key for (run, micro-batch) — ONE
    derivation shared by the writer and every consumer that filters on
    it (cli --dedup-increment), so the scheme cannot silently diverge.
    The run id is hashed because raw ids may contain path separators."""
    return f"{hashlib.sha1(run_id.encode()).hexdigest()[:12]}_{batch_id}"


def _path_missing(exc: Exception) -> bool:
    """True only for the analyzer's PATH_NOT_FOUND condition — matched
    by ERROR CLASS, not message substring: an unrelated failure whose
    text happens to contain 'Path does not exist' must NOT map to an
    empty store (the batch would silently dedup against nothing)."""
    from pyspark.errors import AnalysisException

    if not isinstance(exc, AnalysisException):
        return False
    cond = None
    for attr in ("getCondition", "getErrorClass"):  # 4.x name, then old
        getter = getattr(exc, attr, None)
        if getter is not None:
            try:
                cond = getter()
            except Exception:
                cond = None
            if cond:
                break
    return cond == "PATH_NOT_FOUND"


def read_store(
    spark: SparkSession, store_path: str, exclude_key: str | None = None
) -> DataFrame:
    """The signature store as a DataFrame (empty when the path does not
    exist yet); ``exclude_key`` drops the partition a crashed attempt of
    the current batch already wrote.

    ONLY a missing path maps to the empty store — any other read
    failure (permissions, corrupt footer, transient FS error) must
    propagate: swallowing it would dedup the batch against nothing and
    silently accept duplicates of the whole corpus."""
    try:
        store = spark.read.schema(STORE_SCHEMA_BATCHED).parquet(store_path)
    except Exception as e:
        if _path_missing(e):
            return spark.createDataFrame([], STORE_SCHEMA_BATCHED)
        raise
    if exclude_key is not None:
        store = store.where(F.col("batch") != exclude_key)
    return store


def increment_batch_writer(
    store_path: str,
    out_path: str,
    run_id: str = "stream",
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    max_hamming: int = 3,
    near: bool = True,
    checkpoint_dir: str | None = None,
):
    """Build the foreachBatch callable. Writes per batch: the kept docs
    (original columns) under ``out_path`` and their signature rows under
    ``store_path``, each as the ``batch=<run>_<id>`` partition of its
    dataset."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        key = increment_key(run_id, batch_id)
        store = read_store(spark, store_path, exclude_key=key)
        res = dedup_increment(
            batch_df,
            store.select("fp", "code"),
            id_col=id_col,
            text_col=text_col,
            bits=bits,
            max_hamming=max_hamming,
            near=near,
            checkpoint_dir=checkpoint_dir,
        )
        # kept docs first, store delta last: a crash between the two
        # leaves this batch's docs unclaimed in the store, and the
        # re-execution redoes both writes from the same store state.
        # Directory-scoped overwrite (not dynamic partition overwrite):
        # an EMPTY result must still replace a previous attempt's files.
        res.kept.write.mode("overwrite").parquet(f"{out_path}/batch={key}")
        res.store_delta.write.mode("overwrite").parquet(
            f"{store_path}/batch={key}"
        )

    return _process
