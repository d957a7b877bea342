"""x30/x100 scaling evidence for the heaviest r12 operators.

SCALING.json's `r12c_ops_scaling` measured sf0.01 -> sf0.1 (x10) growth and
CLAIMED the Spark/DuckDB crossover lands "between x10 and x100" by
extrapolation. This tool MEASURES the x30 and x100 points for the five
heaviest r12 entries — q155 (PASS-JOIN edit-distance join), q156
(ExactSubstr dup spans), q166 (triangle counting), q176 (basket lift),
q181 (k-core peel) — on the same corpus-growth shape the other sections
use: the sf0.01 base tables multiplied xM as DISJOINT key-remapped copies
(UNION ALL of the same parquet with per-copy key offsets — same value
distribution, no synthesized data):

- lineitem:  l_orderkey/l_partkey + k*1_000_000 per copy k — the co-order
  graph (q166/q181) and basket set (q176) grow as M disjoint components,
  the natural "corpus grows" shape (a shared-partkey union would instead
  densify a fixed-size graph xM).
- part:      p_partkey + k*1_000_000; copies k>=1 get a ' cNN' name suffix
  so the distinct-name set grows ~xM (the PASS-JOIN folds duplicate
  strings arithmetically, so un-suffixed copies would measure nothing).
- documents: doc_id + k*1_000_000, text unchanged — duplicated text is
  exactly ExactSubstr's workload and its gram->count>=2 pipeline is linear
  in occurrences, not pairs.

Max key after 100 copies is ~1.0e8 < 2^31, so q166's (deg<<32)+id long
packing stays overflow-free.

Each (engine, multiplier) cell runs in its OWN subprocess with a hard
timeout, so a brute-force DuckDB oracle that goes quadratic (q155 was
already 84.7 s at x10 in r12b) records DNF instead of wedging the sweep.
Spark cells: 1 prime + 2 timed runs per query, min reported (both kept);
DuckDB cells: 1 prime + 1 timed run. Orchestrate with an idle host.

Usage:
  python tools/bench_r12x.py                 # r12 sweep, one JSON line
  python tools/bench_r12x.py --r13           # r13 sweep (QUERIES_R13)
  python tools/bench_r12x.py --mults 1,30    # subset of multipliers
  python tools/bench_r12x.py --spark-cell 30 # internal (subprocess entry)
  python tools/bench_r12x.py --duck-cell 30 q155_editdist_join
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_R12X_BASE", "/root/testdata/sf0.01")
WORK = os.environ.get("SPARK_GRAFT_R12X_WORK", "/tmp/r12x")
# NOTE: --r13 switches SPARK_GRAFT_R12X_SET/_WORK via env before spawning
# cells, so subprocesses resolve the same mode and directory.
MULTS = (1, 10, 30, 100)
QUERIES = (
    "q155_editdist_join",
    "q156_dup_spans",
    "q166_triangle_nodes",
    "q176_basket_lift",
    "q181_kcore_peel",
)
#: --r13 mode: the heaviest r13 entries. events multiplies as disjoint
#: user/id-remapped copies with the timestamps shifted +k*90 days per
#: copy, so per-user histories stay constant-size while users, the
#: co-order graph (q212 also reads lineitem/orders) and the time span
#: all grow xM — the corpus-growth shape for product analytics.
QUERIES_R13 = (
    "q212_hits_authority",
    "q213_textrank_keywords",
    "q215_sax_motifs",
    "q220_window_funnel",
    "q221_event_runs",
)
#: --r9 mode: the r9 ingest/curation probes — the slowest remaining local
#: Spark group (r9_ops ~24 s at sf0.1). All five read only `documents`,
#: which multiplies as disjoint doc_id-remapped copies with text/lang/
#: source/n_chars passed through: sources and near-dup structure repeat
#: per copy, so index sizes and candidate sets grow xM — the corpus-growth
#: shape the ingest loop sees in production.
QUERIES_R9 = (
    "q131_ingest_neardup",
    "q132_admission_manifest",
    "q133_phash_neardup",
    "q138_ingest_passage_dedup",
    "q148_dsir_importance",
)
#: --r14 mode: the heaviest r14 additions. documents/lineitem/orders
#: multiply as in the other modes; two r14-specific twists: part gets
#: DENSE offsets (k * base-row-count instead of k * 1e6) because q228's
#: ancestor walk requires a closed contiguous key space (parent(p) is
#: uniform in [1, p-1] and every ancestor must itself exist), and
#: lineitem carries l_shipdate/l_extendedprice through so q233's daily
#: cents grow xM on a CONSTANT day grid (exercising the 128-bit
#: sufficient-statistic headroom the query was built for).
QUERIES_R14 = (
    "q225_split_contamination",
    "q226_degree_assortativity",
    "q228_ancestor_closure",
    "q232_label_propagation",
    "q233_revenue_acf",
    "q237_bfs_levels",
    "q238_item_cosine_cf",
    "q241_mutual_nn",
    "q242_bounded_shortest_path",
    "q246_spearman_brand",
    "q247_mann_whitney",
    "q249_winsorized_mean",
)
#: --r15 mode: same materialization semantics as r14 (dense part offsets,
#: lineitem pricing/date passthrough, embeddings multiplied). Covers the
#: two entries the r14 verdict flagged as having no scale curve (q170's
#: band select is claimed linear in group size; q200's five monitoring
#: legs grow with the xM-shifted event time span) plus the six queries
#: whose plans changed in r15 (graph de-floor, q225/q226 one-pass, q246's
#: now-valid lineitem-part join).
QUERIES_R15 = (
    "q170_exact_quantile",
    "q200_monitoring_capstone",
    "q225_split_contamination",
    "q226_degree_assortativity",
    "q232_label_propagation",
    "q237_bfs_levels",
    "q242_bounded_shortest_path",
    "q246_spearman_brand",
)
SPARK_CELL_TIMEOUT = 3600
DUCK_CELL_TIMEOUT = 900
OFFSET = 1_000_000
#: tables materialize() writes per multiplier (also the _DONE stamp)
TABLES = ("lineitem", "part", "documents", "events", "orders")


def _mode_tables() -> tuple[str, ...]:
    """r14 additionally multiplies embeddings (for q241): vec_id and
    LABEL both offset per copy, so the label BLOCKS stay constant-size
    while their count grows xM — the blocked-MNN scale path (finer
    quantizer buckets), not M^2-bigger blocks."""
    if os.environ.get("SPARK_GRAFT_R12X_SET") in ("r14", "r15"):
        return TABLES + ("embeddings",)
    return TABLES


def _mult_dir(m: int) -> str:
    return os.path.join(WORK, f"m{m}")


def materialize(m: int) -> str:
    """Write the xM key-remapped tables (idempotent per multiplier)."""
    import duckdb

    out = _mult_dir(m)
    # _DONE records the table list so a dir materialized by an older
    # version of this tool (fewer tables) is rebuilt, not trusted — a
    # stale 3-table m30 dir once turned a 0.8 s DuckDB cell into a
    # phantom DNF (missing-view IOException in the subprocess).
    done = os.path.join(out, "_DONE")
    mode = os.environ.get("SPARK_GRAFT_R12X_SET", "r12")
    # v5: the stamp versions the COLUMN layout AND key mapping (adding a
    # passthrough column to a mode used to leave stale dirs that crash the
    # new query; v4 added l_returnflag/p_brand passthrough for
    # q246/q247/q249; v5 remaps l_partkey with the same DENSE per-copy
    # offset as p_partkey in r14 mode — with the old k*1e6 l_partkey
    # offsets, q246's lineitem-part join matched only the copy-0 slice at
    # every multiplier, measuring a degenerate constant-size join)
    stamp = f"{m}:{mode}:v5:{','.join(_mode_tables())}"
    if os.path.isdir(out) and os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == stamp:
                return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")

    def copy(union_sql: str, name: str) -> None:
        con.execute(
            f"COPY ({union_sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )

    li = f"{BASE_SF}/lineitem.parquet"
    pt = f"{BASE_SF}/part.parquet"
    # r14 needs a CLOSED contiguous partkey space (q228's ancestor walk:
    # parent(p) in [1, p-1] must itself exist) — dense per-copy offsets.
    # l_partkey MUST use the SAME dense offset so the lineitem-part join
    # (q246) matches every copy, not just the copy-0 slice.
    if mode in ("r14", "r15"):
        base_n = con.execute(f"SELECT count(*) FROM '{pt}'").fetchone()[0]
        part_off = int(base_n)
    else:
        part_off = OFFSET
    # r14 carries the pricing/date columns through for q233 (daily cents
    # grow xM on a constant day grid)
    li_extra = (
        ", l_shipdate, l_extendedprice, l_quantity, l_returnflag"
        if mode in ("r14", "r15")
        else ""
    )
    copy(
        " UNION ALL ".join(
            f"SELECT CAST(l_orderkey + {k * OFFSET} AS BIGINT) AS l_orderkey,"
            f" CAST(l_partkey + {k * part_off} AS BIGINT) AS l_partkey,"
            f" CAST(l_suppkey + {k * OFFSET} AS BIGINT) AS l_suppkey"
            f"{li_extra}"
            f" FROM '{li}'"
            for k in range(m)
        ),
        "lineitem",
    )
    copy(
        " UNION ALL ".join(
            f"SELECT CAST(p_partkey + {k * part_off} AS BIGINT) AS p_partkey,"
            + (" p_brand," if mode in ("r14", "r15") else "")
            + (
                " p_name"
                if k == 0
                else f" p_name || ' c{k:02d}' AS p_name"
            )
            + f" FROM '{pt}'"
            for k in range(m)
        ),
        "part",
    )
    dc = f"{BASE_SF}/documents.parquet"
    copy(
        " UNION ALL ".join(
            f"SELECT CAST(doc_id + {k * OFFSET} AS BIGINT) AS doc_id,"
            f" text, lang, source, n_chars"
            f" FROM '{dc}'"
            for k in range(m)
        ),
        "documents",
    )
    ev = f"{BASE_SF}/events.parquet"
    copy(
        " UNION ALL ".join(
            f"SELECT CAST(event_id + {k * 10 * OFFSET} AS BIGINT) AS event_id,"
            f" ts + INTERVAL {k * 90} DAY AS ts,"
            f" CAST(user_id + {k * OFFSET} AS BIGINT) AS user_id,"
            f" event_type, value"
            f" FROM '{ev}'"
            for k in range(m)
        ),
        "events",
    )
    # q212 also reads orders: multiply with matching orderkey/custkey
    # offsets so the bipartite graph grows as disjoint copies
    od = f"{BASE_SF}/orders.parquet"
    copy(
        " UNION ALL ".join(
            f"SELECT CAST(o_orderkey + {k * OFFSET} AS BIGINT) AS o_orderkey,"
            f" CAST(o_custkey + {k * OFFSET} AS BIGINT) AS o_custkey"
            f" FROM '{od}'"
            for k in range(m)
        ),
        "orders",
    )
    if "embeddings" in _mode_tables():
        eb = f"{BASE_SF}/embeddings.parquet"
        copy(
            " UNION ALL ".join(
                f"SELECT CAST(vec_id + {k * OFFSET} AS BIGINT) AS vec_id,"
                f" embedding,"
                f" CAST(label + {k * 100} AS INTEGER) AS label"
                f" FROM '{eb}'"
                for k in range(m)
            ),
            "embeddings",
        )
    con.close()
    with open(done, "w") as f:
        f.write(stamp)
    return out


def _query_set() -> tuple[str, ...]:
    mode = os.environ.get("SPARK_GRAFT_R12X_SET")
    base = {"r13": QUERIES_R13, "r9": QUERIES_R9, "r14": QUERIES_R14,
            "r15": QUERIES_R15}.get(mode, QUERIES)
    # comma-separated subset for targeted re-measures (e.g. after a single
    # query's plan changes) — inherited by the cell subprocesses via env
    only = os.environ.get("SPARK_GRAFT_R12X_QUERIES")
    if only:
        want = {q.strip() for q in only.split(",") if q.strip()}
        return tuple(q for q in base if q in want)
    return base


def spark_cell(m: int) -> None:
    """Run the mode's Spark queries on the xM dir; one JSON line per query
    (flushed immediately, so a timeout keeps the completed rows)."""
    from csv_loader_spark.queries.registry import all_specs
    from csv_loader_spark.session import get_spark

    d = _mult_dir(m)
    spark = get_spark("bench_r12x")
    specs = all_specs()
    for name in _query_set():
        fn = specs[name].fn
        fn(spark, d).count()  # prime (codegen/broadcast/JIT warm)
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, d).count()
            runs.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps({"query": name, "mult": m, "runs": runs}), flush=True
        )
    spark.stop()


def duck_cell(m: int, qname: str) -> None:
    import duckdb

    from csv_loader_spark.queries.registry import all_specs

    d = _mult_dir(m)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in _mode_tables():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'"
        )
    sql = all_specs()[qname].oracle
    con.execute(sql).fetchall()  # prime
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    print(
        json.dumps(
            {"query": qname, "mult": m, "sec": round(time.perf_counter() - t0, 3)}
        ),
        flush=True,
    )


def orchestrate(mults: tuple[int, ...]) -> None:
    qset = _query_set()
    results: dict[str, dict[str, dict[str, object]]] = {
        q: {} for q in qset
    }
    for m in mults:
        print(f"materialize x{m} ...", file=sys.stderr, flush=True)
        materialize(m)
        # Spark: one session per multiplier (per-query rows stream out)
        proc = subprocess.run(
            [sys.executable, __file__, "--spark-cell", str(m)],
            capture_output=True,
            text=True,
            timeout=SPARK_CELL_TIMEOUT + 60,
        )
        got = set()
        for line in proc.stdout.splitlines():
            try:
                row = json.loads(line)
            except ValueError:
                continue
            results[row["query"]][f"x{m}"] = {"spark": min(row["runs"]),
                                              "spark_runs": row["runs"]}
            got.add(row["query"])
            print(f"  spark x{m} {row['query']}: {row['runs']}",
                  file=sys.stderr, flush=True)
        for q in qset:
            if q not in got:
                results[q].setdefault(f"x{m}", {})["spark"] = "DNF"
        # DuckDB: one subprocess per query so a quadratic oracle DNFs alone
        for q in qset:
            try:
                p = subprocess.run(
                    [sys.executable, __file__, "--duck-cell", str(m), q],
                    capture_output=True,
                    text=True,
                    timeout=DUCK_CELL_TIMEOUT,
                )
                row = json.loads(p.stdout.strip().splitlines()[-1])
                results[q].setdefault(f"x{m}", {})["duckdb"] = row["sec"]
                print(f"  duck  x{m} {q}: {row['sec']}", file=sys.stderr,
                      flush=True)
            except (subprocess.TimeoutExpired, ValueError, IndexError):
                results[q].setdefault(f"x{m}", {})["duckdb"] = (
                    f"DNF>{DUCK_CELL_TIMEOUT}s"
                )
                print(f"  duck  x{m} {q}: DNF", file=sys.stderr, flush=True)
    mode = os.environ.get("SPARK_GRAFT_R12X_SET", "r12")
    out = {
        "metric": f"{mode}_x100_scaling",
        "base_sf_dir": BASE_SF,
        "tool": "tools/bench_r12x.py",
        "method": (
            {"r13": "heaviest r13 operators (events xM: user_id/event_id "
                     "remapped per copy, ts shifted +k*90d — users and time "
                     "span grow, per-user history constant)",
             "r9": "r9 ingest/curation probes (documents xM: doc_id remapped "
                   "per copy, text/lang/source/n_chars passthrough — "
                   "near-dup structure repeats per copy, index and "
                   "candidate sets grow xM)",
             "r14": "heaviest r14 additions (part gets DENSE k*base_n "
                    "offsets so q228's ancestor key space stays closed; "
                    "lineitem carries shipdate/extendedprice so q233's "
                    "daily cents grow xM on a constant day grid)",
             "r15": "r14 materialization semantics; sweeps the two "
                    "unswept weak entries (q170 quantile band, q200 "
                    "monitoring capstone over the xM-long event span) "
                    "plus the six queries whose plans changed in r15"}.get(
                mode, "five heaviest r12 operators")
            + " on sf0.01 tables multiplied xM as "
            "DISJOINT key-remapped copies (keys + k*1e6; part names "
            "suffixed ' cNN' per copy so distinct-name count grows xM); "
            "Spark local[32] 1 prime + min of 2 timed, DuckDB 32 threads "
            "1 prime + 1 timed; each (engine,mult) cell its own subprocess "
            f"with hard timeout (duck {DUCK_CELL_TIMEOUT}s -> DNF)."
        ),
        "multipliers": list(mults),
        "results": results,
    }
    print(json.dumps(out))


def main() -> None:
    argv = sys.argv[1:]
    if argv[:1] == ["--spark-cell"]:
        spark_cell(int(argv[1]))
    elif argv[:1] == ["--duck-cell"]:
        duck_cell(int(argv[1]), argv[2])
    else:
        for flag, mode in (("--r13", "r13"), ("--r9", "r9"), ("--r14", "r14"),
                           ("--r15", "r15")):
            if flag in argv:
                os.environ["SPARK_GRAFT_R12X_SET"] = mode
                os.environ.setdefault(
                    "SPARK_GRAFT_R12X_WORK", f"/tmp/{mode}x"
                )
                globals()["WORK"] = os.environ["SPARK_GRAFT_R12X_WORK"]
                argv = [a for a in argv if a != flag]
        mults = MULTS
        if argv[:1] == ["--mults"]:
            mults = tuple(int(x) for x in argv[1].split(","))
        orchestrate(mults)


if __name__ == "__main__":
    main()
