"""Skew-mitigation join helpers.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles moderate skew transparently by splitting oversized
shuffle partitions. Salting is the explicit fallback for EXTREME skew —
one key holding a double-digit share of the fact — where even a split
partition pins a single join key to few tasks:

  * the large side gets a salt in [0, n) derived from xxhash64 of the
    whole row (deterministic for a given input, uniform);
  * the small side is exploded n-fold, one copy per salt value;
  * the join key becomes (key, salt), spreading the hot key over n tasks.

Cost: small side inflates n-fold (keep it the dimension side), results
are identical to the unsalted join (salt never affects matches, only
placement). Semi/anti joins need dedup after salting and are not
supported here — use AQE for those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_tls_salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join `large ⋈ small` on `on`, salted n_salts ways.

    `how` supports inner/left (outer semantics preserved: an unmatched
    large row keeps exactly one copy because each (row, salt) pair is
    unique on the large side)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    l = large.withColumn(SALT_COL, salt)
    s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("bigint"))
    joined = l.join(s, on + [SALT_COL], how)
    return joined.drop(SALT_COL)
