"""Ingestion-throughput benchmark: the ETL metric that maps directly onto
the reference's workload (stream a pings CSV → parse/clean → nested
messages). The reference publishes no numbers (BASELINE.md) and is
single-threaded by construction; this measures our parallel path on the
same machine. Prints one JSON line.

Generates a deterministic synthetic CSV once (seeded, ~N rows, mixed
narrow/wide/dirty like FIXTURES.md §A), then times:
  read_pings (parse+clean) → to_vehicle_messages → count
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_loader_spark.io.pings import read_pings  # noqa: E402
from csv_loader_spark.sinks.envelope import to_vehicle_messages  # noqa: E402
from csv_loader_spark.session import get_spark  # noqa: E402

N_ROWS = int(os.environ.get("SPARK_GRAFT_INGEST_ROWS", 2_000_000))
CSV_PATH = f"/tmp/spark_graft_ingest_bench_{N_ROWS}.csv"


def _generate(path: str, n: int) -> None:
    rng = random.Random(1234)
    with open(path, "w") as f:
        for i in range(n):
            ts = f"2015-06-{1 + i % 28:02d} {i % 24:02d}:{i % 60:02d}:{(i * 7) % 60:02d}+00"
            vid = rng.randint(1, 500_000)
            lat = 40.0 + (i % 10_000) * 1e-4
            lon = -74.0 - (i % 10_000) * 1e-4
            if i % 997 == 0:  # dirty row (dropped by the malformed filter)
                f.write(f"not-a-time,{vid},{lat},{lon}\n")
            elif i % 13 == 0:  # wide 11-field row
                f.write(f"{ts},{vid},a,b,c,d,e,f,g,{lat},{lon}\n")
            else:
                f.write(f"{ts},{vid},{lat},{lon}\n")


def main() -> None:
    if not os.path.exists(CSV_PATH):
        _generate(CSV_PATH, N_ROWS)
    spark = get_spark("bench_ingest")
    # newline-free producer → splittable scan (io/pings.py multiline switch)
    from csv_loader_spark.io.pings import read_pings_raw, project_pings

    read_pings(spark, CSV_PATH).limit(1).count()  # warm (codegen, listing)
    t0 = time.perf_counter()
    pings = project_pings(read_pings_raw(spark, CSV_PATH, multiline=False))
    n = to_vehicle_messages(pings).count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "ingest_rows_per_sec",
                "value": round(n / dt),
                "unit": "rows/sec",
                "rows_out": n,
                "rows_in": N_ROWS,
                "sec": round(dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
