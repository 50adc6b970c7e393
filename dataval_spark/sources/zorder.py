"""Z-order (Morton) clustering for multi-column data skipping.

``sources/layout.py``'s range-sort gives perfect file pruning on ONE
key: files carry disjoint [min, max] bounds on the leading sort column,
so a predicate on it opens O(1) files — but a predicate on any OTHER
column still touches every file, because a lexicographic sort scrambles
the trailing columns' per-file ranges. At 100 TB a table usually has
two or three independent read axes (e.g. ``conv_id`` and ``ts``;
``doc_id`` and quality score), and picking one for the sort abandons
the others.

Z-ordering fixes that with the classic space-filling-curve trick
(Morton 1966; the same layout Iceberg/Delta expose as ``ZORDER BY``):

1. quantile-bucket each clustering column into ``2**bits_per_col``
   rank buckets (equi-DEPTH, so skew in the raw values cannot starve
   the curve — a heavy-hitter value occupies many buckets' worth of
   rows but the bucket boundaries still split the rest evenly);
2. interleave the bucket ids' bits into one integer key
   (col0 bit0, col1 bit0, ..., col0 bit1, col1 bit1, ...);
3. range-partition + sort the rows on that key and drop it before
   writing.

Rows close on the curve are close in EVERY bucketed dimension, so each
output file covers a small hyper-rectangle of the value space and its
parquet-footer min/max stays tight on ALL clustered columns — the
manifest-stats pruning in ``SnapshotTable.scan`` then skips files for a
predicate on any one of them, at the cost of slightly weaker (but still
bounded: ~n_files**(1 - 1/k) candidates for a point query on one of k
columns) pruning per single axis than a dedicated sort would give.

Everything is JVM-side Column arithmetic: boundaries come from one
``approxQuantile`` pass (Greenwald–Khanna sketch, driver receives
O(cols * 2**bits) floats), bucketing is an ``F.aggregate`` fold over a
literal boundary array, interleaving is shift/AND/OR — no Python UDFs,
so the key computation stays inside whole-stage codegen.

Reference parity: the reference's release sink orders its outputs by
the filesystem tree alone (/root/reference/dataval/run_package_release
.py:180-224) — single-axis locality; this module is the engine-added
multi-axis analog for table-native storage.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "compute_boundaries",
    "zorder_key",
    "zordered",
    "write_zordered",
]

_MAX_KEY_BITS = 63  # the key is a signed long; keep the sign bit clear


def compute_boundaries(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    relative_error: float = 0.01,
) -> dict[str, list[float]]:
    """Per-column ascending quantile boundaries (up to ``2**bits - 1``
    interior cut points) from one Greenwald–Khanna sketch pass over
    ``df``. Duplicates collapse (a heavy-hitter value spanning several
    quantiles yields fewer, still-sound boundaries); NULLs are ignored
    by the sketch and land in bucket 0 at assignment time. Columns must
    be numeric/castable-to-double — cast timestamps or dictionary-coded
    strings upstream."""
    _check_cols(cols, bits_per_col)
    n = (1 << bits_per_col) - 1
    probs = [(i + 1) / (n + 1) for i in range(n)]
    casted = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    all_bounds = casted.stat.approxQuantile(cols, probs, relative_error)
    out: dict[str, list[float]] = {}
    for c, bnds in zip(cols, all_bounds):
        uniq: list[float] = []
        for b in bnds:  # approxQuantile returns them ascending
            if not uniq or b > uniq[-1]:
                uniq.append(float(b))
        out[c] = uniq
    return out


def zorder_key(
    boundaries: dict[str, list[float]],
    cols: list[str],
    bits_per_col: int = 8,
) -> Column:
    """The Morton key Column for ``cols`` under ``boundaries``.

    bucket(c) = #{boundary <= value} — an ``F.aggregate`` fold over the
    literal boundary array (O(2**bits) JVM adds per row, no shuffle, no
    UDF); NULL values contribute 0 to every term and so land in bucket
    0 (they cluster together at the curve's origin, matching NULLS
    FIRST). Bits are interleaved column-major-by-bit: output bit
    ``i * len(cols) + j`` is bit ``i`` of column ``j``'s bucket, so all
    columns contribute equally at every granularity of the curve."""
    _check_cols(cols, bits_per_col)
    terms: list[Column] = []
    ncols = len(cols)
    for j, c in enumerate(cols):
        bnds = boundaries.get(c, [])
        if bnds:
            arr = F.array(*[F.lit(b) for b in bnds])
            bucket = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, x: acc
                + F.when(F.col(c).cast("double") >= x, 1).otherwise(0),
            )
        else:  # constant/empty column: no discrimination possible
            bucket = F.lit(0)
        bucket = bucket.cast("long")
        for i in range(bits_per_col):
            terms.append(
                F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                    i * ncols + j,
                )
            )
    return reduce(add, terms)


def zordered(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    n_ranges: int | None = None,
    boundaries: dict[str, list[float]] | None = None,
) -> DataFrame:
    """``df`` clustered on the Z-curve over ``cols``: range-partitioned
    and sorted within partitions on the Morton key, key column dropped
    (the drop is a projection, so the row order survives). Boundaries
    default to one ``compute_boundaries`` pass over ``df`` itself; pass
    precomputed ones to cluster an increment consistently with an
    existing table."""
    if boundaries is None:
        boundaries = compute_boundaries(df, cols, bits_per_col)
    key = zorder_key(boundaries, cols, bits_per_col)
    tagged = df.withColumn("__zkey", key)
    parted = (
        tagged.repartitionByRange(n_ranges, "__zkey")
        if n_ranges is not None
        else tagged.repartitionByRange("__zkey")
    )
    return parted.sortWithinPartitions("__zkey").drop("__zkey")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits_per_col: int = 8,
    n_ranges: int | None = None,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
    mode: str = "error",
) -> None:
    """``layout.write_sorted``'s multi-axis sibling: write ``df``
    Z-clustered on ``cols``. Same sizing rules — ``n_ranges`` targets a
    few hundred MB per range at scale, ``maxRecordsPerFile`` bounds any
    file a residually-skewed range would emit."""
    out = zordered(df, cols, bits_per_col, n_ranges)
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.format(fmt).save(path)


def _check_cols(cols: list[str], bits_per_col: int) -> None:
    if not cols:
        raise ValueError("zorder needs at least one column")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate zorder columns: {cols}")
    if bits_per_col < 1:
        raise ValueError(f"bits_per_col must be >= 1, got {bits_per_col}")
    width = len(cols) * bits_per_col
    if width > _MAX_KEY_BITS:
        raise ValueError(
            f"{len(cols)} cols x {bits_per_col} bits = {width} key bits "
            f"> {_MAX_KEY_BITS} (signed long); lower bits_per_col"
        )
