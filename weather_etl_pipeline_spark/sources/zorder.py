"""Z-order layout rewrite — multi-dimensional data skipping.

``compact_zone`` (maintenance.py) fixes the small-file axis; this
fixes the CLUSTERING axis: a table laid out in ingest order prunes
scans on the ingest key only, so a 100 TB lake filtered by any OTHER
column reads everything. Z-ordering interleaves the bits of several
columns' quantile ranks into one sort key, so each written file (and
each row group inside it) covers a tight hyper-rectangle of ALL the
clustered columns — parquet min/max stats then prune scans on ANY of
them. This is the hand-rolled form of Delta's ``OPTIMIZE ... ZORDER
BY``; with Delta jars present the call site swaps for that statement
(same probe posture as sources/formats.py).

Spark-first shape, one pass + one shuffle:

1. per-column quantile boundaries via ``df.stat.approxQuantile`` — a
   driver-side SKETCH (Greenwald-Khanna), 2^bits boundaries per
   column, no shuffle. Quantile ranks, not raw values: bit
   interleaving needs uniformly-occupied bucket ids, and raw-value
   bucketing degenerates under skew (one hot bucket = no pruning);
2. bucket ids via a codegen'd HOF count-of-boundaries-below (O(2^bits)
   comparisons per row per column, JVM-side, no UDF);
3. the z-value is a literal-unrolled bit interleave of the bucket ids
   (pure arithmetic, whole-stage codegen);
4. ``repartitionByRange(n_files, z)`` + ``sortWithinPartitions(z)`` +
   write — the ONLY shuffle, a range exchange on the z key. Each
   output file is a contiguous z-range = a tight hyper-rectangle.

Supported column types: numerics and timestamps (cast to epoch
seconds). Nulls sort into bucket 0 (first z-range) — they stay
prunable for IS NOT NULL ranges and never poison other files' stats.

Verification (tests/test_zorder.py): pyarrow footer stats — after a
z-order rewrite, range filters on EVERY clustered column prune to a
strict subset of files, while a single-column-sorted layout prunes
only its own sort column. The skipping PRECONDITION (tight per-file
min/max on all clustered columns) is asserted directly from the
written footers, engine-independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_write", "zvalue_column"]

_DEFAULT_BITS = 8


_NUMERIC_DTYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal"
)


def _numeric(col: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        return F.unix_timestamp(col).cast("double")
    if dtype == "date":
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if dtype.startswith(_NUMERIC_DTYPES):
        return col.cast("double")
    # loud, not silent: an unsupported dtype would cast to NULL, land
    # every row in bucket 0, and quietly produce a layout with ZERO
    # clustering on that column — a no-op that looks like success
    raise ValueError(
        f"zorder supports numeric/timestamp/date columns; got {dtype!r}"
    )


def zvalue_column(
    df: DataFrame, cols: list[str], bits: int = _DEFAULT_BITS
) -> Column:
    """The interleaved z-value as a Column (LONG) over ``cols``.

    bits × len(cols) must fit a signed 64-bit int; 8 bits × up to 7
    columns is the practical envelope (Delta's default is analogous).
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds int64")
    dtypes = dict(df.dtypes)
    n_buckets = (1 << bits) - 1  # bucket ids 0..2^bits-1; 0 reserved-ish for null
    # one sketch pass for ALL columns (driver-side boundaries)
    numeric_df = df.select(
        *[_numeric(F.col(c), dtypes[c]).alias(c) for c in cols]
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bnds = {
        c: qs
        for c, qs in zip(
            cols, numeric_df.stat.approxQuantile(cols, probs, 1.0 / (4 * n_buckets))
        )
    }
    bucket_cols = []
    for c in cols:
        col = _numeric(F.col(c), dtypes[c])
        arr = F.lit([float(b) for b in bnds[c]])
        # bucket id = #boundaries <= value (codegen'd HOF, no UDF);
        # nulls -> 0
        b = F.coalesce(
            F.size(F.filter(arr, lambda x: x <= col)), F.lit(0)
        ).cast("long")
        bucket_cols.append(b)
    # literal-unrolled bit interleave: output bit (i*len+j) takes bit i
    # of column j's bucket id — pure shifts/masks, whole-stage codegen
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            out_bit = i * len(bucket_cols) + j
            z = z + (
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), out_bit
                )
            )
    return z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = _DEFAULT_BITS,
) -> None:
    """Rewrite ``df`` to ``path`` z-ordered on ``cols`` (module doc)."""
    from ..catalog import temp_col

    zc = temp_col(df, "z")
    (
        df.withColumn(zc, zvalue_column(df, cols, bits))
        .repartitionByRange(n_files, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode("overwrite")
        .parquet(path)
    )
