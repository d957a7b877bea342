"""Multi-format timestamp parsing — reference-parity (CsvLoader.java:237-273).

The reference's ``parseTimeStrToMilli``:
1. snips an optional fractional-seconds part (between the first ``.`` and the
   first ``+``/``Z``/end), keeping it as a decimal fraction;
2. tries three formats in order: ``yyyy-MM-dd HH:mm:ssX`` (explicit offset),
   ``yyyy-MM-dd HH:mm:ss`` (reference: JVM default TZ — we pin UTC, see
   SURVEY.md §7.4), then general ISO-8601;
3. returns epoch millis + round-down(frac * 1000).

Implemented as a single Catalyst expression (coalesce over to_timestamp
attempts + regexp fraction extraction) — no UDF, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fractional part: first "." up to first "+", "Z", "-" (offset) or end
_FRAC_RE = r"\.(\d+)"


def _strip_fraction(col: Column) -> Column:
    """Remove the fractional-seconds token so the fixed formats match."""
    return F.regexp_replace(col, _FRAC_RE, "")


def parse_time_to_millis(col: Column | str) -> Column:
    """String timestamp (3 accepted formats, optional fraction) → epoch ms.

    Returns NULL for unparseable input (the malformed-row filter drops those —
    reference behavior at CsvLoader.java:140-143, drop-and-log).
    """
    c = F.col(col) if isinstance(col, str) else col
    base = _strip_fraction(c)
    parsed = F.coalesce(
        # format 1: explicit numeric offset or Z, e.g. "2016-06-02 14:03:22+03"
        F.try_to_timestamp(base, F.lit("yyyy-MM-dd HH:mm:ssXXXXX")),
        F.try_to_timestamp(base, F.lit("yyyy-MM-dd HH:mm:ssXXX")),
        F.try_to_timestamp(base, F.lit("yyyy-MM-dd HH:mm:ssX")),
        # format 2: no offset → session TZ (pinned UTC)
        F.try_to_timestamp(base, F.lit("yyyy-MM-dd HH:mm:ss")),
        # format 3: general ISO-8601 ("2016-06-02T14:03:22Z", date-only, ...).
        # Spark's bare try_to_timestamp also accepts time-only strings like
        # "08:30:15" (today's date) — the reference's ISO-8601 parser does
        # not, so require a leading date.
        F.when(
            base.rlike(r"^\d{4}-\d{2}-\d{2}"), F.try_to_timestamp(base)
        ),
    )
    frac_str = F.regexp_extract(c, _FRAC_RE, 1)
    # reference: Double.parseDouble("0." + frac) * 1000, truncated toward zero
    frac_ms = F.when(frac_str == "", F.lit(0)).otherwise(
        F.floor(F.concat(F.lit("0."), frac_str).cast("double") * 1000).cast("long")
    )
    return (F.unix_millis(parsed) + frac_ms).alias("time_ms")
