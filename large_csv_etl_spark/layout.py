"""Multi-dimensional data layout: Z-order clustering for write-side
locality (the 100 TB companion to ``io.write_table_clustered``).

Parquet min/max stats prune row groups only when the file is sorted on the
filtered column; a sort on (a, b) gives perfect pruning on ``a`` and none
on ``b``. Interleaving the bits of both columns' range-bucket ids (a
Z-order / Morton key) spreads locality across ALL clustered columns, so
predicates on any subset still skip most row groups — the layout Delta/
Iceberg expose as ``OPTIMIZE ZORDER BY``. Everything here is JVM bitwise
expressions (shiftright/and/or) over ``width_bucket`` range ids: no UDFs,
no shuffle beyond the standard range partitioning of the sort itself.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _bucket_id(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by its position in [mn, mx].

    ``width_bucket`` returns 1..n+1 over the open top edge; clamping folds
    the max value into the top bucket. Degenerate ranges (mn == mx) land
    everything in bucket 0.
    """
    n = F.lit(2**bits)
    raw = F.width_bucket(col.cast("double"), mn, mx, n) - F.lit(1)
    return F.when(mx <= mn, F.lit(0)).otherwise(
        F.least(F.greatest(raw, F.lit(0)), n - F.lit(1))
    )


def _interleave(ids: list[Column], bits: int) -> Column:
    """Morton-interleave k bucket ids, LSB-first: output bit (i*k + j) is
    bit i of ids[j]. Static expression tree (bits * k shift/and/or terms),
    whole-stage-codegen friendly."""
    terms = []
    k = len(ids)
    for i in range(bits):
        for j, c in enumerate(ids):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * k + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> Column:
    """Z-order key expression for ``cols`` (numeric/date/timestamp).

    Bounds come from one tiny min/max aggregate collected on the driver
    (2 values per column — bounded regardless of table size), folded into
    the expression as literals so the key itself is a pure row-local
    projection.
    """
    if bits * len(cols) > 62:
        raise ValueError(
            f"zorder key needs {bits * len(cols)} bits; max 62 (BIGINT sign)"
            " — lower `bits` or cluster fewer columns"
        )
    dtypes = dict(df.dtypes)

    def as_double(c: str) -> Column:
        col = F.col(c)
        t = dtypes.get(c, "")
        # ANSI forbids casting temporal types straight to double — go
        # through an explicit epoch integer instead
        if t == "date":
            return F.unix_date(col).cast("double")
        if t.startswith("timestamp"):
            return F.unix_micros(col.cast("timestamp")).cast("double")
        return col.cast("double")

    mm = df.agg(
        *[F.min(as_double(c)).alias(f"{c}__mn") for c in cols],
        *[F.max(as_double(c)).alias(f"{c}__mx") for c in cols],
    ).first()
    ids = [
        _bucket_id(
            as_double(c),
            F.lit(mm[f"{c}__mn"]),
            F.lit(mm[f"{c}__mx"]),
            bits,
        )
        for c in cols
    ]
    return _interleave(ids, bits)


def write_table_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Write ``df`` range-partitioned and sorted by its Z-order key.

    ``repartitionByRange`` on the key gives globally contiguous Morton
    ranges per file; the within-partition sort lines up parquet row-group
    min/max stats along the curve, so a predicate on ANY of ``cols``
    prunes most files AND most row groups inside the survivors.
    """
    key = zorder_key(df, cols, bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(
            n_files or df.sparkSession.sparkContext.defaultParallelism, "__zkey"
        )
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
