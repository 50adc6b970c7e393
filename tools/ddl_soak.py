"""One-off deep soak of the snapshot DDL layer: 10 seeds x
{main, branch} randomized op sequences (append/rename/drop/widen/
add-default/COW+MOR delete/compact/expire+vacuum) against the
pytest mirror oracle, with mid-sequence row checks and a
fast-forward check on the branch variant. Last run: 20/20 clean
(round 6, session 4). Not part of CI - run by hand when the scope
machinery changes."""
import sys, random
import os
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
from dataval_spark.session import get_spark
from dataval_spark.sources.snapshots import SnapshotTable
from test_schema_ddl_random import Mirror, _value, _TYPES, _spark_rows
import tempfile, os

spark = get_spark(master="local[8]", shuffle_partitions=8)
root = tempfile.mkdtemp(prefix="soak_")

def run_seq(seed, use_branch):
    rng = random.Random(seed)
    t = SnapshotTable(spark, os.path.join(root, f"t{seed}_{use_branch}"))
    m = Mirror()
    m.schema = [("c0", "bigint"), ("c1", "int"), ("c2", "string")]
    next_col = [3]
    def mk(n):
        return [{nm: _value(rng, ty) for nm, ty in m.schema} for _ in range(n)]
    def push(tbl, batch):
        sdf = spark.createDataFrame([tuple(r[n] for n in m.names()) for r in batch],
                                    ", ".join(f"{n} {ty}" for n, ty in m.schema))
        tbl.append(sdf); m.append(batch)
    push(t, mk(6))
    tgt = t
    if use_branch:
        t.create_branch("wip"); tgt = t.branch("wip")
    for step in range(20):
        op = rng.choice(["append","append","rename","drop","widen","add","delete","compact","expire"])
        names = m.names()
        try:
            if op == "append": push(tgt, mk(rng.randrange(1,5)))
            elif op == "rename":
                old = rng.choice(names); new = f"c{next_col[0]}"; next_col[0]+=1
                tgt.rename_column(old, new); m.rename(old, new)
            elif op == "drop":
                if len(names) <= 2: continue
                v = rng.choice(names)
                try: tgt.drop_column(v)
                except ValueError: continue
                m.drop(v)
            elif op == "widen":
                el = [(n,ty) for n,ty in m.schema if ty=="int"]
                if not el: continue
                n,_ = rng.choice(el); to = rng.choice(["bigint","double"])
                tgt.widen_column(n, to); m.widen(n, to)
            elif op == "add":
                name = f"c{next_col[0]}"; next_col[0]+=1
                d = rng.choice(_TYPES); dv = _value(rng, d)
                tgt.add_column(name, d, default=dv); m.add(name, d, dv)
            elif op == "delete":
                num = [n for n,ty in m.schema if ty in ("int","bigint")]
                if not num: continue
                c = rng.choice(num); lo = rng.randrange(-500,400); hi = lo + rng.randrange(0,400)
                tgt.delete_where({c:(lo,hi)}, mode=rng.choice(["copy-on-write","merge-on-read"]))
                m.delete(c, lo, hi)
            elif op == "compact":
                tgt.compact(target_file_bytes=64*1024*1024)
            else:
                if not use_branch:
                    t.expire_snapshots(keep_last=2)
                    t.vacuum()
        except Exception as e:
            print(f"SEED {seed} branch={use_branch} step {step} op {op}: UNEXPECTED {type(e).__name__}: {e}")
            return False
        if _spark_rows(tgt, m.names()) != m.sorted_rows():
            print(f"SEED {seed} branch={use_branch} step {step} op {op}: MISMATCH")
            return False
    if use_branch:
        t.fast_forward("wip")
        if _spark_rows(t, m.names()) != m.sorted_rows():
            print(f"SEED {seed} POST-FF MISMATCH"); return False
    return True

ok = 0
for seed in [11, 97, 1013, 2029, 3847, 5923, 7717, 8887, 9291, 10007]:
    for ub in (False, True):
        if run_seq(seed, ub): ok += 1
        print(f"done seed={seed} branch={ub}", flush=True)
print(f"SOAK RESULT: {ok}/20 sequences clean")
