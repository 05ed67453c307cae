"""Per-partition column statistics (SURVEY.md §2.4 A1-A3, A23, A24).

ONE aggregation job computes, for every column and every partition group:
row count, null count, min/max, mean/stddev (population), and approximate
distinct cardinality (HyperLogLog++ via approx_count_distinct).  The result
is a tidy long-format DataFrame (group, column, stats...) produced by
exploding the wide aggregate — the explode runs on the already-tiny
aggregate output, not on row data.

Reference semantics: validators.py:45-82 (null/inf counts, zero variance)
and univariate.py:59-67 (mean/std), generalized to the north rule's
per-partition grain (BASELINE.json:6).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from driftspark.stats import nn


def profile_columns(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    group_cols: Optional[Sequence[str]] = None,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Tidy per-(group, column) stats DataFrame.

    Output schema: group_cols... , column, n_rows, null_count, null_rate,
    approx_distinct, min, max, mean, stddev (numeric columns only for the
    last four; stringified min/max for orderable non-numerics).
    """
    group_cols = list(group_cols or [])
    fields = {f.name: f.dataType for f in df.schema.fields}
    columns = [c for c in (columns or df.columns) if c not in group_cols]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nul||{c}"))
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd=approx_rsd).alias(f"adc||{c}")
        )
        if isinstance(fields[c], NumericType):
            aggs.append(F.min(nn(c)).alias(f"min||{c}"))
            aggs.append(F.max(nn(c)).alias(f"max||{c}"))
            aggs.append(F.mean(nn(c)).alias(f"avg||{c}"))
            aggs.append(F.stddev_pop(nn(c)).alias(f"std||{c}"))

    wide = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)

    structs = []
    for c in columns:
        is_num = isinstance(fields[c], NumericType)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"nul||{c}").alias("null_count"),
                # try_divide: an empty frame has __n = 0 (ANSI abort)
                F.try_divide(F.col(f"nul||{c}"), F.col("__n")).alias("null_rate"),
                F.col(f"adc||{c}").alias("approx_distinct"),
                (F.col(f"min||{c}") if is_num else F.lit(None).cast("double")).alias("min"),
                (F.col(f"max||{c}") if is_num else F.lit(None).cast("double")).alias("max"),
                (F.col(f"avg||{c}") if is_num else F.lit(None).cast("double")).alias("mean"),
                (F.col(f"std||{c}") if is_num else F.lit(None).cast("double")).alias("stddev"),
            )
        )
    return wide.select(
        *group_cols, F.explode(F.array(*structs)).alias("s")
    ).select(*group_cols, "s.*")


def phash_histogram(
    df: DataFrame,
    phash_col: str = "phash",
    group_cols: Optional[Sequence[str]] = None,
    prefix_bits: int = 8,
) -> DataFrame:
    """Perceptual-hash distribution histogram (A24): bucket = top
    ``prefix_bits`` bits of the signed 64-bit phash, counted per group.
    Pure bit-op bucketing, partial-aggregated map-side."""
    group_cols = list(group_cols or [])
    bucket = F.shiftrightunsigned(F.col(phash_col), 64 - prefix_bits).alias("bucket")
    return (
        df.where(F.col(phash_col).isNotNull())
        .groupBy(*group_cols, bucket)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def outlier_report(
    df: DataFrame,
    columns: Sequence[str],
    group_cols: Optional[Sequence[str]] = None,
    k: float = 1.5,
    exact: bool = True,
) -> DataFrame:
    """Per-(group, column) Tukey-fence outlier rates: counts outside
    [q25 - k*IQR, q75 + k*IQR] with the fences computed GLOBALLY (one
    exact-percentile aggregation — pandas-parity interpolation, the
    quantile_edges path; ``exact=False`` switches to the GK sketch at
    the scale where an exact percentile is unrealistic).

    Global fences + per-group counts is the validation semantic: "which
    partition is producing values abnormal for the WHOLE table" — fences
    computed per group would hide a partition that is abnormal overall
    but internally consistent.  A constant column (IQR 0) degenerates
    explicitly: every value != the constant counts as an outlier.

    ONE counting scan with all columns' conditional sums fused; output is
    O(groups x columns): (group cols..., column, n, n_null, n_low,
    n_high, outlier_rate, lo_fence, hi_fence).
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    from driftspark.stats import percentiles_by_column

    quarts = percentiles_by_column(df, columns, [0.25, 0.75], exact)

    gb = [F.col(g) for g in (group_cols or [])]
    aggs = []
    fences = {}
    for c in columns:
        q = quarts[c]
        if q is None:  # all-null column: no fences, count nulls only
            fences[c] = (None, None)
            lo_pred = F.lit(False)
            hi_pred = F.lit(False)
        else:
            iqr = float(q[1]) - float(q[0])
            lo, hi = float(q[0]) - k * iqr, float(q[1]) + k * iqr
            fences[c] = (lo, hi)
            lo_pred = nn(c) < F.lit(lo)
            hi_pred = nn(c) > F.lit(hi)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(nn(c))).alias(f"{c}__nnull"),
            F.sum(lo_pred.cast("long")).alias(f"{c}__lo"),
            F.sum(hi_pred.cast("long")).alias(f"{c}__hi"),
        ]
    wide = df.groupBy(*gb).agg(*aggs) if gb else df.agg(*aggs)

    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__nnull").alias("n_null"),
            F.coalesce(F.col(f"{c}__lo"), F.lit(0)).alias("n_low"),
            F.coalesce(F.col(f"{c}__hi"), F.lit(0)).alias("n_high"),
            F.lit(fences[c][0]).cast("double").alias("lo_fence"),
            F.lit(fences[c][1]).cast("double").alias("hi_fence"),
        )
        for c in columns
    ]
    out = wide.select(
        *(group_cols or []), F.explode(F.array(*structs)).alias("s")
    ).select(
        *(group_cols or []),
        "s.column", "s.n", "s.n_null", "s.n_low", "s.n_high",
        F.try_divide(
            F.col("s.n_low") + F.col("s.n_high"),
            F.col("s.n") - F.col("s.n_null"),
        ).alias("outlier_rate"),
        "s.lo_fence", "s.hi_fence",
    )
    return out
