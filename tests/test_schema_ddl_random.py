"""Randomized operation-sequence test for schema evolution: a seeded
random interleaving of append / rename / drop / widen / add-default /
merge-on-read delete / compact against a driver-side mirror (plain
Python rows + schema list). Every scope-list interaction the unit
tests cover pairwise — rename chains across appends, defaults through
renames, deletes through drops-of-other-columns, compaction
materializing everything — gets exercised in random composition here.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources.snapshots import SnapshotTable

_TYPES = ["int", "bigint", "double", "string"]


def _value(rng: random.Random, dtype: str):
    if rng.random() < 0.15:
        return None
    if dtype == "int":
        return rng.randrange(-1000, 1000)
    if dtype == "bigint":
        return rng.randrange(-10**9, 10**9)
    if dtype == "double":
        return rng.randrange(-4000, 4000) / 2.0  # exact in binary
    return "s" + str(rng.randrange(100))


def _norm(v):
    # Spark returns ints for int/bigint, floats for double — the mirror
    # stores exactly those Python types, so == is exact
    return v


class Mirror:
    """Driver-side oracle: schema = [(name, dtype)], rows = list of
    dicts keyed by CURRENT logical names (renames rewrite keys, drops
    remove them, adds backfill the default — semantically what the
    engine promises without any scope machinery)."""

    def __init__(self):
        self.schema: list[tuple[str, str]] = []
        self.rows: list[dict] = []

    def names(self):
        return [n for n, _ in self.schema]

    def append(self, batch: list[dict]):
        self.rows.extend(batch)

    def rename(self, old, new):
        self.schema = [
            (new if n == old else n, t) for n, t in self.schema
        ]
        self.rows = [
            {(new if k == old else k): v for k, v in r.items()}
            for r in self.rows
        ]

    def drop(self, name):
        self.schema = [(n, t) for n, t in self.schema if n != name]
        self.rows = [{k: v for k, v in r.items() if k != name} for r in self.rows]

    def widen(self, name, to):
        self.schema = [
            (n, to if n == name else t) for n, t in self.schema
        ]
        if to == "double":
            for r in self.rows:
                if r[name] is not None:
                    r[name] = float(r[name])

    def add(self, name, dtype, default):
        self.schema.append((name, dtype))
        for r in self.rows:
            r[name] = default

    def delete(self, col, lo, hi):
        self.rows = [
            r
            for r in self.rows
            if r[col] is None or not (lo <= r[col] <= hi)
        ]

    def key(self, r):
        return tuple(
            (v is None, repr(_norm(v))) for v in (r[n] for n in self.names())
        )

    def sorted_rows(self):
        return sorted((self.key(r) for r in self.rows))


def _spark_rows(t: SnapshotTable, names):
    df = t.read().select(*names)
    return sorted(
        tuple((v is None, repr(_norm(v))) for v in (row[n] for n in names))
        for row in df.collect()
    )


@pytest.mark.parametrize("seed", [7, 1291, 40961])
def test_random_ddl_sequences_match_mirror(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = SnapshotTable(spark, str(tmp_path / f"t{seed}"))
    m = Mirror()
    # start with 3 columns, two appended generations
    m.schema = [("c0", "bigint"), ("c1", "int"), ("c2", "string")]
    next_col = 3

    def mk_batch(n):
        return [
            {nm: _value(rng, ty) for nm, ty in m.schema}
            for _ in range(n)
        ]

    def push(batch):
        sdf = spark.createDataFrame(
            [tuple(r[n] for n in m.names()) for r in batch],
            ", ".join(f"{n} {ty}" for n, ty in m.schema),
        )
        t.append(sdf)
        m.append(batch)

    push(mk_batch(8))
    ops_done = []
    for step in range(22):
        op = rng.choice(
            ["append", "append", "rename", "drop", "widen", "add", "delete", "compact"]
        )
        names = m.names()
        if op == "append":
            push(mk_batch(rng.randrange(1, 6)))
        elif op == "rename":
            old = rng.choice(names)
            new = f"c{next_col}"
            next_col += 1
            try:
                t.rename_column(old, new)
            except ValueError:
                continue  # e.g. nothing to rename under a guard
            m.rename(old, new)
        elif op == "drop":
            if len(names) <= 2:
                continue
            victim = rng.choice(names)
            try:
                t.drop_column(victim)
            except ValueError:
                continue  # pending MOR delete references it — guard
            m.drop(victim)
        elif op == "widen":
            eligible = [
                (n, ty) for n, ty in m.schema if ty in ("int", "float")
            ]
            if not eligible:
                continue
            n, ty = rng.choice(eligible)
            to = rng.choice(["bigint", "double"]) if ty == "int" else "double"
            t.widen_column(n, to)
            m.widen(n, to)
        elif op == "add":
            name = f"c{next_col}"
            next_col += 1
            dtype = rng.choice(_TYPES)
            default = _value(rng, dtype)
            t.add_column(name, dtype, default=default)
            m.add(name, dtype, default)
        elif op == "delete":
            numeric = [n for n, ty in m.schema if ty in ("int", "bigint")]
            if not numeric:
                continue
            col = rng.choice(numeric)
            lo = rng.randrange(-500, 400)
            hi = lo + rng.randrange(0, 400)
            mode = rng.choice(["copy-on-write", "merge-on-read"])
            t.delete_where({col: (lo, hi)}, mode=mode)
            m.delete(col, lo, hi)
        else:
            t.compact(target_file_bytes=64 * 1024 * 1024)
        ops_done.append(op)
        if step % 6 == 5:  # periodic mid-sequence checks
            assert t.read().columns == m.names(), ops_done
            assert _spark_rows(t, m.names()) == m.sorted_rows(), ops_done
    assert t.read().columns == m.names(), ops_done
    assert dict(t.read().dtypes) == dict(m.schema), ops_done
    assert _spark_rows(t, m.names()) == m.sorted_rows(), ops_done
    # and the full sequence still compacts down to a clean single layout
    t.compact()
    assert _spark_rows(t, m.names()) == m.sorted_rows(), ops_done
    snap = t.snapshot()
    assert not snap.get("renames") and not snap.get("deletes")


@pytest.mark.parametrize("seed", [523])
def test_random_ddl_sequence_on_branch_then_publish(spark, tmp_path, seed):
    """The same randomized op sequence applied to a BRANCH handle, then
    fast-forwarded: main must equal the mirror — composition evidence
    that every scope-list mechanism (renames/retired/defaults/deletes)
    rides the branch chain and survives the publish."""
    rng = random.Random(seed)
    t = SnapshotTable(spark, str(tmp_path / f"b{seed}"))
    m = Mirror()
    m.schema = [("c0", "bigint"), ("c1", "int"), ("c2", "string")]
    next_col = 3

    def mk_batch(n):
        return [{nm: _value(rng, ty) for nm, ty in m.schema} for _ in range(n)]

    def push(tbl, batch):
        sdf = spark.createDataFrame(
            [tuple(r[n] for n in m.names()) for r in batch],
            ", ".join(f"{n} {ty}" for n, ty in m.schema),
        )
        tbl.append(sdf)
        m.append(batch)

    push(t, mk_batch(6))
    t.create_branch("wip")
    b = t.branch("wip")
    for _ in range(14):
        op = rng.choice(["append", "append", "rename", "drop", "widen", "add", "delete"])
        names = m.names()
        if op == "append":
            push(b, mk_batch(rng.randrange(1, 5)))
        elif op == "rename":
            old = rng.choice(names)
            new = f"c{next_col}"
            next_col += 1
            b.rename_column(old, new)
            m.rename(old, new)
        elif op == "drop":
            if len(names) <= 2:
                continue
            victim = rng.choice(names)
            try:
                b.drop_column(victim)
            except ValueError:
                continue
            m.drop(victim)
        elif op == "widen":
            eligible = [(n, ty) for n, ty in m.schema if ty == "int"]
            if not eligible:
                continue
            n, _ty = rng.choice(eligible)
            to = rng.choice(["bigint", "double"])
            b.widen_column(n, to)
            m.widen(n, to)
        elif op == "add":
            name = f"c{next_col}"
            next_col += 1
            dtype = rng.choice(_TYPES)
            default = _value(rng, dtype)
            b.add_column(name, dtype, default=default)
            m.add(name, dtype, default)
        else:
            numeric = [n for n, ty in m.schema if ty in ("int", "bigint")]
            if not numeric:
                continue
            col = rng.choice(numeric)
            lo = rng.randrange(-500, 400)
            hi = lo + rng.randrange(0, 400)
            b.delete_where({col: (lo, hi)},
                           mode=rng.choice(["copy-on-write", "merge-on-read"]))
            m.delete(col, lo, hi)
    # main untouched until publish
    assert t.read().columns == ["c0", "c1", "c2"]
    t.fast_forward("wip")
    assert t.read().columns == m.names()
    assert dict(t.read().dtypes) == dict(m.schema)
    assert _spark_rows(t, m.names()) == m.sorted_rows()
