"""Count py4j round trips (and wall time) spent BUILDING each query's
DataFrame — the driver-side construction cost that r15 showed dominates
the per-query floor on a loaded driver host.

Every `F.<fn>(...)`/Column-operator call in PySpark is 1-2 synchronous
py4j `send_command` round trips (reflection + invoke). The count is a
load-independent measure of construction cost: unlike wall time it does
not move with CPU steal, so before/after construction-cost claims are
made in counts first and wall clock second.

Usage:
    python tools/count_roundtrips.py [sf_dir] [query_name ...]

Prints one line per query: `<calls> <build_seconds> <name>`, sorted by
calls descending, plus a total. Only construction is measured — nothing
is executed (no actions), so this is safe to run on any sf_dir.
"""

from __future__ import annotations

import sys
import time

from py4j import clientserver, java_gateway

COUNTER = {"n": 0}


def _patch() -> None:
    """Wrap both possible client classes' send_command with a counter."""
    for cls in (java_gateway.GatewayClient, clientserver.JavaClient):
        orig = cls.send_command

        def wrapped(self, *a, _orig=orig, **kw):
            COUNTER["n"] += 1
            return _orig(self, *a, **kw)

        cls.send_command = wrapped


def main() -> int:
    _patch()
    # $SPARK_GRAFT_REPO lets an A/B harness point the same tool at a
    # worktree pinned to an older commit (the "before" side).
    import os

    sys.path.insert(0, os.environ.get("SPARK_GRAFT_REPO", "/root/repo"))
    from csv_loader_spark.session import get_spark
    from csv_loader_spark.queries.registry import all_specs

    argv = [a for a in sys.argv[1:]]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("count_roundtrips")
    rows = []
    for name, spec in all_specs().items():
        if only and name not in only:
            continue
        before = COUNTER["n"]
        t0 = time.time()
        spec.fn(spark, sf_dir)  # build only — no action
        rows.append((COUNTER["n"] - before, time.time() - t0, name))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    for calls, sec, name in rows:
        print(f"{calls:7d} {sec:7.3f}s {name}")
    print(f"{total:7d} TOTAL over {len(rows)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
