"""csv_loader_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``opentraffic/csv-loader`` (a single-pass CSV→protobuf→HTTP vehicle
GPS ping loader, see ``/root/reference/src/main/java/.../CsvLoader.java``),
re-expressed Spark-first and extended with a relational operator library and
LLM-training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Layout
------
- ``session``    — tuned SparkSession builder (AQE, UTC, shuffle partitions).
- ``io``         — table loading + reference-parity ping ingestion (CSV/gz/zip).
- ``queries``    — the operator library: each operator is a named query with a
                   DuckDB oracle SQL string (the correctness contract).
- ``functions``  — reusable column expressions (timestamps, ids, text, vectors).
- ``sinks``      — protobuf envelope + HTTP/Kinesis sinks with the reference's
                   retry matrix.
- ``streaming``  — Structured Streaming variants (watermarks, windows, state).
"""

__version__ = "0.1.0"
