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
