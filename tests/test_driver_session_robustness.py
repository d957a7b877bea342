"""The driver hands queries ITS SparkSession, whose timezone we don't
control; every query must pin UTC semantics itself (tune_session)."""

from csv_loader_spark.queries.registry import all_specs


def test_q58_correct_under_non_utc_session(spark):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = {
            r["vehicle_id"]: r["ts_millis"]
            for r in all_specs()["q58_ping_ingest"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()
        }
        # format-2 (no offset) must parse as UTC regardless of session TZ
        assert rows[104] == 1433147415000
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
