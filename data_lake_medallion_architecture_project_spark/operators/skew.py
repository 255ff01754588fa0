"""Skew mitigation — salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew,
but it only kicks in for sort-merge joins after a shuffle materializes; a
pathologically hot key (one customer with 10% of a 100 TB fact table) is
cheaper to neutralize at plan time. Classic salting:

* the LARGE side appends a salt in [0, salts) derived by hashing row-unique
  columns — the hot key's rows spread over `salts` partitions;
* the SMALL side is exploded ×salts (one copy per salt value);
* the join key becomes (key, salt) — same result, no hot partition.

The salt must come from columns that vary WITHIN a join key (any row id);
hashing the join key itself would put the whole hot key in one salt bucket
again. Result equality with the unsalted join is guaranteed for inner joins
regardless of salt distribution — salting only re-buckets work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    salt_cols: list[str],
    salts: int = 8,
) -> DataFrame:
    """Inner-join `large` to `small` on a potentially skewed key.

    ``salt_cols``: columns of `large` that vary within a key (e.g. the fact
    row's id) — they seed the salt so one hot key fans out over `salts`
    shuffle partitions. `small` is replicated ×salts (keep it small or
    broadcast-sized)."""
    salt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salts))
    l_salted = large.withColumn(_SALT, salt)
    s_salted = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    joined = l_salted.join(
        s_salted,
        (l_salted[large_key] == s_salted[small_key]) & (l_salted[_SALT] == s_salted[_SALT]),
    )
    return joined.drop(_SALT)
