"""Loaders for the benchmark star-schema tables.

Parquet-first: every query reads columnar parquet so Catalyst predicate
pushdown / column pruning reach the scan (check with
``df.explain("formatted")`` — ``PushedFilters`` + a narrow ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_loader_spark.session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Plan cache: spark.read.parquet re-lists the file and re-reads the footer
# on every call (~50-100 ms of driver time per table); multi-table queries
# were paying this 4-6× per plan build. DataFrames are immutable logical
# plans, so reuse within a session is safe. Keyed by the live session
# OBJECT (not id() — ids are reused after GC and a stale plan bound to a
# dead session would poison the cache); pinning the handful of sessions a
# process creates is a bounded, acceptable cost. The cached value carries
# the file's (mtime_ns, size) fingerprint (r7): a regenerated file under
# the same path — the lived r5 incident — invalidates the entry instead of
# serving a plan whose embedded schema/statistics describe dead bytes.
# One os.stat per call buys that; trivial against the footer read saved.
_TABLE_CACHE: dict[
    tuple[SparkSession, str, str], tuple[tuple[int, int] | None, DataFrame]
] = {}


def file_fingerprint(path: str) -> tuple[int, int] | None:
    """(newest mtime_ns, total size) over a file or a directory tree —
    cheap identity for 'did the data under this path change'. Recurses the
    whole tree: a partitioned table (name.parquet/date=X/part-0.parquet)
    rewritten IN PLACE changes neither the top directory's stat nor its
    subdirs' sizes, only the leaf files' — one-level scanning would serve
    the stale cache for exactly the incident class this exists to close.
    Cost is one stat per file, paid per load_table call; trivial next to
    the footer read the cache saves. None when the path is missing (the
    subsequent read raises the real error).

    Known limitation: a same-size rewrite landing within the filesystem's
    mtime granularity is invisible to a stat-only identity — a sub-tick
    in-place regeneration on a coarse-mtime filesystem can still serve the
    stale plan. Accepted trade for a stat-only check; hash the parquet
    footers instead if that window ever matters."""
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_mtime_ns, st.st_size)
        newest, total = st.st_mtime_ns, 0
        for dirpath, _dirnames, filenames in os.walk(path):
            newest = max(newest, os.stat(dirpath).st_mtime_ns)
            for fn in filenames:
                s = os.stat(os.path.join(dirpath, fn))
                newest = max(newest, s.st_mtime_ns)
                total += s.st_size
        return (newest, total)
    except OSError:
        return None


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TimestampType (UTC instant).

    The driver has generated ``events.parquet`` two ways across rounds:

    - parquet TIMESTAMP(NANOS): Spark's vector reader rejects it, so the
      session sets ``nanosAsLong`` and the column arrives as ``bigint``
      nanos; rebuild by integer-dividing to µs (``DIV`` keeps the arithmetic
      in int64 — a double round-trip would lose precision at 1.7e18; the
      truncation-toward-zero matches DuckDB's ns→µs cast).
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
      TIMESTAMP_NTZ, which watermarks and ``unix_micros`` reject; cast to
      TimestampType. The session TZ is pinned UTC, so the cast maps the wall
      clock to the same instant DuckDB's naive TIMESTAMP renders.
    """
    t = dict(df.dtypes).get(col)
    if t == "bigint":
        # Backtick-quote the column: a name with a space/hyphen/keyword
        # would otherwise mis-parse inside F.expr. DIV (not /) keeps the
        # arithmetic in int64.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
    elif t == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one benchmark table; pins session TZ to UTC first (determinism).

    ``events.ts`` arrives as nanos-as-bigint or TIMESTAMP_NTZ depending on
    the driver's parquet writer vintage — :func:`normalize_event_ts` maps
    both to TimestampType.
    """
    # tune_session runs on EVERY call, cache hit or miss: timestamp
    # rendering happens at collect time under the session's then-current
    # timezone, so a driver that flips the TZ between queries would
    # otherwise silently change results served from the plan cache.
    tune_session(spark)
    key = (spark, sf_dir, name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    fp = file_fingerprint(path)
    cached = _TABLE_CACHE.get(key)
    if cached is not None and cached[0] == fp:
        return cached[1]
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_event_ts(df)
    # The regenerated testdata writes ALL timestamps as parquet
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ, which
    # rejects watermarks/unix_micros and breaks ntz-vs-ltz comparisons in
    # the query library. Session TZ is pinned UTC, so casting to
    # TimestampType is instant-preserving and matches DuckDB's naive
    # TIMESTAMP rendering (the pre-regeneration semantics).
    #
    # Normally DEAD: session.py sets inferTimestampNTZ.enabled=false, so
    # these columns already arrive as TimestampType and the loop is a
    # no-op. It fires only when the parquet file embeds a Spark schema
    # whose metadata pins TIMESTAMP_NTZ (overriding the inference conf) —
    # and in that case the withColumn cast sits ABOVE the scan, so parquet
    # predicate pushdown on that column is lost. Deliberate trade:
    # correctness (queries keep running on such files) over pushdown on a
    # path that never triggers for driver-generated testdata.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _TABLE_CACHE[key] = (fp, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    picked = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in picked}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views (for the SQL-surface operators, e.g. GROUPING SETS)."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def persisted_by_fingerprint(cache, key, fp_path, build):
    """One copy of the fingerprint-keyed persisted-DataFrame lifecycle:
    return ``cache[key]`` while ``fp_path``'s :func:`file_fingerprint` is
    unchanged; otherwise unpersist the stale entry, ``build()`` a fresh
    frame, persist + materialize it (unpersisting on a failed
    materialization rather than leaking), and register it.

    Used by queries/llm7._df_sorted_tokens. queries/llm4._lsh_candidates
    implements the same contract inline and CANNOT adopt this helper
    as-is: its build materializes guard stats off a second, temporary
    persisted frame that must stay alive through the candidate frame's
    count — a two-frame lifecycle this single-frame helper doesn't model.
    """
    fp = file_fingerprint(fp_path)
    hit = cache.get(key)
    if hit is not None and hit[0] == fp:
        return hit[1]
    if hit is not None:
        hit[1].unpersist()
    df = build().persist()
    try:
        df.count()  # materialize before registering
    except BaseException:
        df.unpersist()
        raise
    cache[key] = (fp, df)
    return df
