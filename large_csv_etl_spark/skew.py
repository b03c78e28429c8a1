"""Skew mitigation utilities (the salting techniques the 100 TB mandate
names; AQE's skew-join splitting covers sort-merge joins automatically,
these cover the two cases it doesn't: hot-key hash aggregation and
broadcast-infeasible joins against a skewed build side).

Both are pure plan rewrites — results are exactly equal to the unsalted
forms (asserted in tests); only the shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    count: bool = True,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys: phase 1 aggregates
    on (keys + salt) so a hot key's rows land on ``n_salts`` reducers
    instead of one; phase 2 merges the partials on the true keys (a
    shuffle of at most |groups| * n_salts tiny rows).

    Counts and sums re-merge exactly (sum of partials); that is why the
    API exposes exactly those. Salt is derived from a hash of the full row
    partition offset — deterministic within a job, uniform across salts.
    """
    sum_cols = sum_cols or []
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    phase1 = (
        df.withColumn(SALT_COL, salt)
        .groupBy(*keys, SALT_COL)
        .agg(
            F.count("*").alias("__cnt"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
        )
    )
    aggs = []
    if count:
        aggs.append(F.sum("__cnt").alias("n_rows"))
    aggs += [F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    return phase1.groupBy(*keys).agg(*aggs)


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    key: str,
    small_key: str | None = None,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join when the small side is too big to
    broadcast and the big side's key distribution is hot: the big side
    gets a random salt in [0, n_salts), the small side is replicated
    n_salts times (explode of a literal range), and the join runs on
    (key, salt) — a hot key's rows spread over n_salts reducers.

    Cost model: small side shuffles n_salts x its size; worth it exactly
    when one reducer's hot-key partition would otherwise dominate the
    stage. Only inner/left joins are semantics-preserving: with right or
    full outer, every unmatched small-side key would surface n_salts
    duplicate null-extended rows, so other join types are rejected.
    """
    if how not in {"inner", "left", "left_outer"}:
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, got {how!r}"
        )
    small_key = small_key or key
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    big_salted = big.withColumn(SALT_COL, salt)
    small_salted = skewed_small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (big_salted[key] == small_salted[small_key]) & (
        big_salted[SALT_COL] == small_salted[SALT_COL]
    )
    return big_salted.join(small_salted, cond, how).drop(SALT_COL)
