"""Partition transforms — Iceberg's "hidden partitioning" for
SnapshotTable.

A 100-TB event table is almost always laid out by a DERIVED value —
the day of a timestamp, a hash bucket of a key — not by a raw column.
Hive-era engines make the user materialize that derived column, carry
it in every row, and remember to filter on it; Iceberg's partition
transforms (bucket/truncate/year/month/day/hour) instead declare the
derivation in table metadata, compute it only at write time, and map
source-column predicates onto partitions automatically at plan time.

This module is that contract for ``SnapshotTable``: ``partition_by``
accepts transform specs alongside plain column names —

    partition_by=["days(ts)"]            # one dir per session-tz day
    partition_by=["bucket(16, user_id)"] # 16 stable hash buckets
    partition_by=["truncate(4, code)"]   # 4-char prefixes / multiples

(time transforms render in spark.sql.session.timeZone, matching how
Spark compares a naive literal to the column — pass naive wall-time
filter values; tz-aware ones are rejected rather than mis-pruned)

The derived hive column exists only in the directory name (the data
files never carry it; the pinned snapshot schema hides it from
readers), and ``scan()`` prunes directories from filters on the SOURCE
column:

* every transform except ``bucket`` is MONOTONE, so a source interval
  [lo, hi] maps to the transform-value interval [f(lo), f(hi)] and the
  normal overlap test applies to the path values;
* ``bucket`` preserves only equality: a point filter (lo == hi) prunes
  to the single bucket ``crc32(str(v)) % n``; range filters fall back
  to the footer-stats bounds (still recorded for the source column).

The bucket hash is crc32 over the value's canonical string form —
chosen over Spark's hash()/xxhash64 because it is reproducible
DRIVER-SIDE (zlib.crc32) without a JVM round-trip, so planning-time
pruning and any external writer can compute the same bucket. Iceberg
parity: spec grammar and transform semantics follow the public Iceberg
spec (partition transforms); the reference engine has no table format —
this generalizes its directory-tree release layout
(/root/reference/run_package_release.py:180-224) the same way
``sources/layout.py`` does for sort order.
"""

from __future__ import annotations

import re
import zlib
from datetime import date, datetime

from pyspark.sql import Column, functions as F

__all__ = ["Transform", "parse_transform", "parse_partition_specs"]

_SPEC_RE = re.compile(
    r"""^\s*
    (?:
        (?P<ident>[A-Za-z_][\w.]*)                       # plain column
      | (?P<fn>years?|months?|days?|hours?)\s*\(\s*
            (?P<tcol>[A-Za-z_][\w.]*)\s*\)               # time transform
      | (?P<bfn>bucket|truncate)\s*\(\s*
            (?P<n>\d+)\s*,\s*(?P<bcol>[A-Za-z_][\w.]*)\s*\)
    )
    \s*$""",
    re.VERBOSE,
)

_TIME_FMT = {
    "year": ("yyyy", "%Y", 4),
    "month": ("yyyy-MM", "%Y-%m", 7),
    "day": ("yyyy-MM-dd", "%Y-%m-%d", 10),
    "hour": ("yyyy-MM-dd-HH", "%Y-%m-%d-%H", 13),
}


def _coerce_ts(v):
    """A filter value for a time transform, as a NAIVE datetime/date
    (interpreted as session-timezone wall time, matching both the
    write-side date_format and Spark's literal comparison of a naive
    value). ISO strings accepted ('2026-08-18', '2026-08-18 10:00:00').
    tz-AWARE values are rejected: the write side renders wall time, so
    mapping an aware instant through strftime would prune files that
    contain matching rows."""
    if isinstance(v, str):
        v = datetime.fromisoformat(v)
    if isinstance(v, datetime) and v.tzinfo is not None:
        raise ValueError(
            f"tz-aware value {v!r} cannot be mapped through a time "
            "partition transform; pass naive session-timezone wall time"
        )
    if isinstance(v, (datetime, date)):
        return v
    raise TypeError(f"cannot map {v!r} through a time partition transform")


class Transform:
    """One parsed partition-spec entry. ``kind`` is 'identity', 'year',
    'month', 'day', 'hour', 'bucket' or 'truncate'; ``source`` the
    source column; ``hive_name`` the derived directory key (== source
    for identity); ``n`` the bucket count / truncate width."""

    def __init__(self, kind: str, source: str, n: int | None = None):
        if kind in ("bucket", "truncate") and (n is None or n < 1):
            raise ValueError(f"{kind} needs a positive size, got {n}")
        self.kind = kind
        self.source = source
        self.n = n

    # -- identity & naming --------------------------------------------------
    @property
    def is_identity(self) -> bool:
        return self.kind == "identity"

    @property
    def hive_name(self) -> str:
        """The derived directory key. Parameterized transforms ENCODE
        their parameter (``id_bucket_16``, ``code_trunc_4``): a table
        whose bucket count or truncate width changes must present as a
        DIFFERENT layout — otherwise old directories' values would be
        silently reinterpreted under the new parameter and pruning
        would drop matching files (Iceberg encodes the parameter in the
        partition field for the same reason)."""
        if self.is_identity:
            return self.source
        suffix = {"truncate": "trunc"}.get(self.kind, self.kind)
        if self.n is not None:
            return f"{self.source}_{suffix}_{self.n}"
        return f"{self.source}_{suffix}"

    @property
    def spec(self) -> str:
        """Canonical spec string (what the snapshot records)."""
        if self.is_identity:
            return self.source
        if self.kind in ("bucket", "truncate"):
            return f"{self.kind}({self.n},{self.source})"
        return f"{self.kind}s({self.source})"

    # -- write side ---------------------------------------------------------
    _BUCKETABLE = {"string", "tinyint", "smallint", "int", "bigint", "long"}

    def expr(self, dtype: str) -> Column:
        """The derived Column (JVM-side, codegen-friendly). ``dtype``
        is the source column's simpleString (truncate is prefix for
        strings, floor-to-multiple for integers — the Iceberg rule).
        ``bucket`` accepts only string/integral sources: those are the
        types whose Spark cast-to-string agrees exactly with Python's
        str() — the agreement plan-time pruning is built on (floats,
        booleans and temporals render differently on the two sides, so
        a bucket over them would prune files containing matches)."""
        c = F.col(self.source)
        if self.is_identity:
            return c
        if self.kind in _TIME_FMT:
            return F.date_format(c, _TIME_FMT[self.kind][0])
        if self.kind == "bucket":
            if dtype not in self._BUCKETABLE:
                raise ValueError(
                    f"bucket({self.n},{self.source}) needs a string or "
                    f"integral source column, got {dtype}: driver-side "
                    "pruning hashes str(value), which only matches "
                    "Spark's cast-to-string for those types"
                )
            return F.pmod(
                F.crc32(c.cast("string").cast("binary")), F.lit(self.n)
            ).cast("int")
        # truncate
        if dtype == "string":
            return F.substring(c, 1, self.n)
        return (c - F.pmod(c, F.lit(self.n))).cast("long")

    # -- plan-time pruning ----------------------------------------------------
    def apply(self, v):
        """The transform of a driver-side filter value — must agree
        exactly with ``expr`` for pruning to be sound."""
        if self.is_identity:
            return v
        if self.kind in _TIME_FMT:
            ts = _coerce_ts(v)
            return ts.strftime(_TIME_FMT[self.kind][1])[: _TIME_FMT[self.kind][2]]
        if self.kind == "bucket":
            s = v if isinstance(v, str) else str(v)
            return zlib.crc32(s.encode("utf-8")) % self.n
        if isinstance(v, str):
            return v[: self.n]
        return int(v) - (int(v) % self.n)

    def interval(self, lo, hi):
        """Map a source-column closed interval to the transform-value
        interval the path entries can be tested against, or None when
        this transform cannot serve the filter (bucket + range: a hash
        scrambles order). Monotone transforms map endpoints directly."""
        if self.kind == "bucket":
            if lo is None or hi is None or lo != hi:
                return None
            b = self.apply(lo)
            return (b, b)
        return (
            self.apply(lo) if lo is not None else None,
            self.apply(hi) if hi is not None else None,
        )

    def parse_path_value(self, s: str):
        """The typed partition value as written in the directory name
        (int for bucket / numeric truncate, string otherwise); None for
        the hive NULL sentinel (never pruned — conservative)."""
        if s == "__HIVE_DEFAULT_PARTITION__":
            return None
        if self.kind == "bucket":
            return int(s)
        if self.kind == "truncate":
            try:
                return int(s)
            except ValueError:
                return s
        return s


def parse_transform(spec: str) -> Transform:
    """Parse one partition_by entry: a plain column name (identity) or
    ``years|months|days|hours(col)`` / ``bucket(n, col)`` /
    ``truncate(w, col)``."""
    m = _SPEC_RE.match(spec)
    if not m:
        raise ValueError(
            f"bad partition spec {spec!r}: expected a column name, "
            "years|months|days|hours(col), bucket(n, col) or "
            "truncate(w, col)"
        )
    if m.group("ident"):
        return Transform("identity", m.group("ident"))
    if m.group("fn"):
        return Transform(m.group("fn").rstrip("s"), m.group("tcol"))
    return Transform(m.group("bfn"), m.group("bcol"), int(m.group("n")))


def parse_partition_specs(specs: list[str]) -> list[Transform]:
    ts = [parse_transform(s) for s in specs]
    names = [t.hive_name for t in ts]
    if len(set(names)) != len(names):
        raise ValueError(f"partition specs collide on hive names: {names}")
    return ts
