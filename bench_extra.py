#!/usr/bin/env python
"""Round-7 optimization profiling harness (separate from the frozen
bench.py). Isolates the expensive queries with the noop sink (guide
S1.4) and prints per-stage wall timings + candidate-volume stats.

Usage: python bench_extra.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataval_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out, dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    which = set(sys.argv[2:]) or {"q45", "q53", "q57", "q51"}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra_r07", master=f"local[{cpus}]")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    import dataval_spark.operators.dedup as D
    import dataval_spark.operators.similarity as S

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    if "q57" in which:
        print("== q57 multitable cosine near-dup ==", flush=True)
        # stage 1: coded frame (bucket keys + norms), materialized
        from dataval_spark.operators.similarity import (
            _vec, lsh_bucket, norm, vector_ok,
        )

        base = (
            emb.where(vector_ok(F.col("embedding"), 64))
            .select(
                F.col("vec_id").alias("doc"),
                F.col("embedding").alias("v"),
                norm(F.col("embedding")).alias("nv"),
            )
            .where(F.col("nv") > 0)
        )
        keys = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_bucket(F.col("v"), 64, 4, t).alias("bkt"),
                )
                for t in range(2)
            ]
        )
        coded = base.select("doc", "v", "nv", F.explode(keys).alias("k"))
        timed(spark, "q57/coded+count", lambda: coded.count())
        # candidate volume
        sizes, _ = timed(
            spark,
            "q57/bucket-sizes",
            lambda: coded.groupBy("k").count().agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
                F.max("count").alias("max_bucket"),
                F.count(F.lit(1)).alias("n_buckets"),
            ).collect(),
        )
        print(f"  candidate pairs: {sizes[0]['pairs']:.0f}, "
              f"max bucket {sizes[0]['max_bucket']}, buckets {sizes[0]['n_buckets']}")
        timed(
            spark, "q57/full",
            lambda: noop(
                S.cosine_near_dup_pairs(emb, dim=64, threshold=0.3, n_tables=2)
                .agg(F.count(F.lit(1)), F.round(F.max("sim"), 4), F.round(F.avg("sim"), 4))
            ),
        )

    if "q53" in which:
        print("== q53 minhash candidates ==", flush=True)
        from dataval_spark.operators.dedup import (
            content_bearing, minhash_band_array,
        )

        keyed = docs.where(content_bearing(F.col("text"))).select(
            F.col("doc_id").alias("doc"),
            F.explode(minhash_band_array(F.col("text"), 4, 2)).alias("band_key"),
        )
        timed(spark, "q53/keyed+count", lambda: keyed.persist().count())
        sizes, _ = timed(
            spark,
            "q53/band-sizes",
            lambda: keyed.groupBy("band_key").count().agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
                F.max("count").alias("max_bucket"),
                F.count(F.lit(1)).alias("n_buckets"),
            ).collect(),
        )
        print(f"  candidate pairs (pre-distinct): {sizes[0]['pairs']:.0f}, "
              f"max bucket {sizes[0]['max_bucket']}, buckets {sizes[0]['n_buckets']}")
        keyed.unpersist()
        timed(
            spark, "q53/full",
            lambda: noop(
                D.minhash_candidates(docs, "doc_id", "text", n_hashes=4, band_size=2)
                .agg(F.count(F.lit(1)), F.countDistinct("doc_a"))
            ),
        )

    if "q45" in which:
        print("== q45 simhash near pairs ==", flush=True)
        from dataval_spark.operators.dedup import (
            content_bearing, hashed_tokens, simhash_from_hashed,
            simhash_chunk_keys,
        )

        coded = docs.where(content_bearing(F.col("text"))).select(
            F.col("doc_id").alias("doc"),
            hashed_tokens(F.col("text"), 60).alias("_ht"),
        ).select("doc", simhash_from_hashed(F.col("_ht"), 60).alias("code"))
        timed(spark, "q45/codes+count", lambda: coded.persist().count())
        keys = simhash_chunk_keys(F.col("code"), 60, 3)
        keyedc = coded.select("doc", F.explode(F.array(*keys)).alias("k"))
        sizes, _ = timed(
            spark,
            "q45/chunk-bucket-sizes",
            lambda: keyedc.groupBy("k").count().agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
                F.max("count").alias("max_bucket"),
                F.count(F.lit(1)).alias("n_buckets"),
            ).collect(),
        )
        print(f"  candidate pairs: {sizes[0]['pairs']:.0f}, "
              f"max bucket {sizes[0]['max_bucket']}, buckets {sizes[0]['n_buckets']}")
        coded.unpersist()
        timed(
            spark, "q45/full",
            lambda: noop(
                D.simhash_near_pairs(docs, "doc_id", "text", bits=60, max_hamming=3)
                .agg(F.count(F.lit(1)),
                     F.sum((F.col("hamming") == 0).cast("long")),
                     F.round(F.avg("hamming"), 4))
            ),
        )

    if "q51" in which:
        print("== q51 dedup clusters ==", flush=True)
        from dataval_spark.queries import QUERIES

        timed(spark, "q51/full", lambda: QUERIES["q51_dedup_clusters"](spark, sf_dir).count())

    spark.stop()


if __name__ == "__main__":
    main()
