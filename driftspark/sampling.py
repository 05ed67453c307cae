"""Bounded deterministic sampling — content-keyed top-n without the
single-task merge.

The engine's deterministic samples (MMD/RCA matrices, domain-classifier
side caps, IVF fit sample) are all "the n rows with the smallest
xxhash64(content)" — stable under partitioning, layout, and parallelism,
unlike positional sampling which has no meaning on a distributed table.

The naive plan, ``df.orderBy(hash).limit(n)``, compiles to
TakeOrderedAndProject: every task keeps an n-row heap, then ONE task
merges n_partitions x n candidate rows.  At 10^5 partitions and n=10^5
that final merge sees 10^10 rows — the sample becomes the job.

``content_keyed_top_n`` bounds the merge: since xxhash64 is uniform over
the signed-64 range, the n-th smallest hash sits near
``min_long + (n/total) * 2^64``, so a pre-filter at ``margin`` times that
quantile keeps ~margin*n candidate rows (margin=8 puts the undershoot
probability below 1e-9 via Chernoff for any n >= 64) and the SAME top-n
falls out: any row above the threshold is beaten by the >= n rows below
it.  The candidate count is verified — on the (pathological) undershoot
the full scan is used, so the result is ALWAYS exactly the naive plan's.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MIN_LONG = -(1 << 63)


def content_keyed_top_n(
    df: DataFrame,
    n: int,
    hash_expr: Column,
    tiebreaks: Sequence = (),
    total: Optional[int] = None,
    margin: float = 8.0,
) -> DataFrame:
    """Exactly ``df.orderBy(hash_expr, *tiebreaks).limit(n)`` with the
    final merge bounded to ~margin*n rows.

    ``total`` skips the row-count job when the caller already knows it
    (the domain-classifier computes both side counts in one job).
    ``hash_expr`` must be a deterministic column expression distributed
    ~uniformly over the full signed-64 range (``F.xxhash64`` is).
    """
    if n <= 0:
        return df.orderBy(hash_expr, *tiebreaks).limit(n)
    if total is None:
        total = df.count()
    frac = margin * n / max(total, 1)
    if frac < 1.0:
        threshold = _MIN_LONG + int(frac * float(1 << 64))
        cand = df.where(hash_expr < F.lit(threshold))
        # verify: the threshold argument needs >= n survivors; a cheap
        # post-filter count (no shuffle) guards the pathological case
        if cand.count() >= n:
            df = cand
    return df.orderBy(hash_expr, *tiebreaks).limit(n)


def content_keyed_top_n_per_group(
    df: DataFrame,
    n: int,
    hash_expr: Column,
    group_cols: Sequence[str],
    tiebreaks: Sequence = (),
    margin: float = 8.0,
    hash_range: tuple = (_MIN_LONG, (1 << 63) - 1),
) -> DataFrame:
    """Stratified deterministic sample: within EVERY group, exactly the
    ``n`` rows with the smallest ``hash_expr`` (ties broken by
    ``tiebreaks``) — "n documents per language/domain/quality bucket"
    for training-data curation, stable under partitioning and layout.

    Scale shape: the naive plan is a row_number window partitioned by
    group, which SORTS each group in one task — a billion-row hot group
    becomes one straggler.  Instead the per-group counts (one
    partial-aggregated groupBy) yield a per-group hash threshold at
    ``margin * n / count`` of the uniform hash range (the
    content_keyed_top_n Chernoff argument, per group); the threshold
    join-back prunes each group to ~margin*n candidate rows BEFORE the
    window, so the per-group sort is O(margin*n) regardless of group
    size.  Groups whose candidate set undershoots ``n`` (pathological
    hash clustering) fall back to their full rows — the result is ALWAYS
    exactly the naive plan's.

    ``hash_expr`` must be deterministic and ~uniform over ``hash_range``
    (inclusive bounds): the default fits ``F.xxhash64(*content)``; the
    engine-portable variant ``F.conv(F.substring(F.md5(...), 1, 15), 16,
    10).cast("long")`` is uniform over ``(0, (1 << 60) - 1)`` — pass that
    range or the pre-filter degenerates (still correct: the undershoot
    fallback restores every group, it just stops pruning).
    Groups with fewer than ``n`` rows return all their rows.
    """
    from pyspark.sql import Window

    lo, hi = hash_range
    span = float(hi) - float(lo)
    group_cols = list(group_cols)
    tagged = df.withColumn("__h", hash_expr)
    counts = tagged.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__gn"))
    frac = F.least(F.lit(1.0), F.lit(margin * n) / F.col("__gn"))
    thresholds = counts.select(
        *group_cols,
        (F.lit(float(lo)) + frac * F.lit(span)).alias("__thr"),
        "__gn",
    )
    cand = tagged.join(thresholds, group_cols).where(
        (F.col("__gn") <= n)  # small groups pass whole
        | (F.col("__h").cast("double") < F.col("__thr"))
    )
    # verify: every group needs >= min(n, group size) candidates; on the
    # (Chernoff-improbable) undershoot fall back to those groups' full
    # rows.  Derived from the per-group COUNTS frame left-joined to the
    # candidate counts — a group whose candidate set is EMPTY produces no
    # groupBy row at all and would otherwise escape detection and vanish
    # from the sample entirely.
    cand_counts = cand.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__cn")
    )
    short = (
        counts.join(cand_counts, group_cols, "left")
        .where(
            F.coalesce(F.col("__cn"), F.lit(0))
            < F.least(F.lit(n), F.col("__gn"))
        )
        .select(*group_cols)
    )
    n_short = short.count()
    if n_short:
        # replace (not augment) the short groups' candidate rows with
        # their full rows — a union without the anti-join would duplicate
        # the candidate rows and the window could emit the same row twice
        rescued = tagged.join(short, group_cols)
        cand = (
            cand.select(tagged.columns)
            .join(short, group_cols, "left_anti")
            .unionByName(rescued)
        )
    else:
        cand = cand.select(tagged.columns)
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h"), *tiebreaks)
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__h", "__rn")
    )
