"""Skew-mitigation join: deterministic salting (SURVEY §2.3 scale toolkit).

AQE's skew-join handling (on in our session defaults) splits oversized
shuffle partitions at runtime and is the first line of defense. Salting is
the explicit, planner-independent fallback for the pathological case AQE
can't fix: ONE join key owning a double-digit percentage of the fact side.

Shape: fact rows get a deterministic salt in [0, n) derived from a
high-cardinality column (NOT the join key — same-key rows must spread);
the dim side is exploded ×n so every (key, salt) bucket finds its match.
The join key becomes (key, salt): the hot key's rows now land in n shuffle
partitions instead of one. Cost: dim side inflates ×n — keep n modest and
the dim side small (it was broadcast-sized anyway or you wouldn't salt).

Everything is deterministic (hash-pmod salt, no rand()) so results are
oracle-checkable and retries are stable — rand() salts break task retry
idempotence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on fact_key = dim_key with an n-way salt.

    ``salt_source``: a high-cardinality fact column (row id, event id) the
    salt is hashed from. Output columns = fact ∪ dim minus the helper salt.
    """
    salt = F.pmod(F.hash(F.col(salt_source) if isinstance(salt_source, str) else salt_source), F.lit(n_salts))
    salted_fact = fact.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    joined = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["__salt"] == salted_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")
