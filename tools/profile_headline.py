"""One-off profiling harness for the headline floor (r7 advice #4):
times q03/q05 at sf0.1 under runtime-settable config variations, steady
state (2 primes + median of 5). Usage:
    python tools/profile_headline.py [conf=val ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_loader_spark.io.tables import TABLES, load_table  # noqa: E402
from csv_loader_spark.queries.registry import all_specs  # noqa: E402
from csv_loader_spark.session import get_spark  # noqa: E402

QUERIES = ("q01_pricing_summary", "q03_topn_revenue", "q05_nation_volume")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    overrides = dict(kv.split("=", 1) for kv in sys.argv[1:])
    for k, v in overrides.items():
        spark.conf.set(k, v)
        print(f"# conf {k}={v}", file=sys.stderr)
    if overrides:
        # load_table calls tune_session on EVERY query invocation, which
        # re-pins adaptive.enabled / timeZone / the parquet confs — without
        # this wrap, an override of any pinned key would be silently undone
        # and the tool would report numbers for a config it didn't run.
        import csv_loader_spark.io.tables as tables_mod
        import csv_loader_spark.session as session_mod

        original = session_mod.tune_session

        def tuned_with_overrides(s):
            original(s)
            for k, v in overrides.items():
                s.conf.set(k, v)
            return s

        session_mod.tune_session = tuned_with_overrides
        tables_mod.tune_session = tuned_with_overrides
    specs = all_specs()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    for _ in range(2):
        for name in QUERIES:
            specs[name].fn(spark, sf_dir).count()
    for name in QUERIES:
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        print(
            f"RESULT {name}: median {med:.3f}s "
            f"(min {min(samples):.3f} max {max(samples):.3f})",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
