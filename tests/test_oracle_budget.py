"""Per-query time budget for the DuckDB oracles at the DRIVER's scale
(sf0.1), not the local gate's sf0.01.

Round 2's lesson: q51's recursive-CTE oracle finished in 17 s at sf0.01
(local gate green) but never terminated at sf0.1 (>500 s), so the
driver's correctness run wedged at q51 and truncated the report after
q50. Local green must predict driver red — this gate runs every oracle
at the driver's scale factor under a hard interrupt so an
intractable-oracle regression fails HERE first.

DuckDB-only (no Spark session): the engine side's sf0.1 wall-times are
tracked by bench.py; this test owns the oracle side.
"""

from __future__ import annotations

import threading
import time

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DRIVER = "/root/testdata/sf0.1"

# Hard per-query ceiling. Slowest legitimate oracle measured 9.7 s
# (q45 brute-force pairs) on this host; 60 s flags anything that grew
# superlinearly without tripping on co-tenant noise.
BUDGET_SEC = 60.0


@pytest.fixture
def duck():
    # function-scoped: the watchdog can fire in the gap between a
    # legitimate query finishing near the budget and cancel() — on a
    # shared connection that stray interrupt flag would abort the NEXT
    # test's execute(). A fresh connection confines it (view creation is
    # metadata-only, microseconds).
    con = duckdb.connect()
    for name in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DRIVER}/{name}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_within_budget_at_driver_sf(duck, name):
    sql = entry_mod.oracle_sql()[name]
    # duckdb has no statement timeout; interrupt from a watchdog thread
    # so an intractable oracle fails the test instead of hanging pytest
    watchdog = threading.Timer(BUDGET_SEC, duck.interrupt)
    watchdog.start()
    t0 = time.perf_counter()
    try:
        duck.execute(sql).fetchall()
    except duckdb.InterruptException:
        elapsed = time.perf_counter() - t0
        pytest.fail(
            f"{name}: oracle exceeded the {BUDGET_SEC:.0f}s budget at sf0.1 "
            f"(interrupted after {elapsed:.0f}s) — this is the q51-round-2 "
            f"failure mode; the driver's gate would wedge here"
        )
    finally:
        watchdog.cancel()
