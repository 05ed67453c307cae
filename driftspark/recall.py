"""Measured-recall telemetry for the approximate matching paths.

Every LSH-family operator in this engine (minhash banding, simhash
chunking, hyperplane embedding LSH, phash bucketing) trades recall for
the removal of the O(n^2) all-pairs join.  The theoretical bounds are
documented per operator (README "Approximate-path recall"); this module
measures the ACHIEVED recall against an exact ground-truth pair set so a
pipeline can assert its bound instead of trusting it — typically over an
exact computation on a content-keyed sample of the corpus, since the
full exact set is precisely the join the approximate path exists to
avoid.

Scale design: one inner join keyed on the normalized pair, sized by the
TRUTH side (the sample — small), which is broadcast; the approximate
pair set streams past it without a shuffle.  Counts come from one
aggregation; nothing is collected but the 4-number summary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRUTH_BROADCAST_LIMIT = 2_000_000


def _normalized_pairs(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Order-insensitive distinct pair key: (least, greatest).  Both pair
    frames in this engine already emit id_a < id_b, but recall must not
    silently depend on that convention holding for third-party inputs."""
    a, b = cols
    return df.select(
        F.least(F.col(a), F.col(b)).alias("__pa"),
        F.greatest(F.col(a), F.col(b)).alias("__pb"),
    ).distinct()


def pair_recall(
    approx_pairs: DataFrame,
    truth_pairs: DataFrame,
    pair_cols: Sequence[str] = ("id_a", "id_b"),
    broadcast_limit: int = TRUTH_BROADCAST_LIMIT,
) -> dict:
    """Achieved recall of ``approx_pairs`` against ``truth_pairs``.

    Returns ``{"n_truth", "n_approx", "n_hit", "recall"}`` where
    ``recall = n_hit / n_truth`` (1.0 for an empty truth set — nothing
    was required, nothing was missed).  Pairs are compared as unordered
    id sets; duplicates on either side count once.

    ``truth_pairs`` is typically exact pairs over a bounded sample
    (``knn_pairs_exact``, ``jaccard_pairs`` on a sampled corpus) — when
    its distinct count is under ``broadcast_limit`` it is broadcast so
    the (large) approximate side never shuffles.
    """
    truth = _normalized_pairs(truth_pairs, pair_cols)
    approx = _normalized_pairs(approx_pairs, pair_cols)
    n_truth = truth.count()
    n_approx = approx.count()
    right = F.broadcast(truth) if n_truth <= broadcast_limit else truth
    n_hit = approx.join(right, ["__pa", "__pb"]).count()
    return {
        "n_truth": n_truth,
        "n_approx": n_approx,
        "n_hit": n_hit,
        "recall": (n_hit / n_truth) if n_truth else 1.0,
    }


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "id_a",
    neighbor_col: str = "id_b",
) -> dict:
    """Recall@k for top-k neighbor search: per query, the fraction of the
    EXACT neighbor set the approximate search returned; reported as the
    mean / min over queries plus the query count.

    ``exact`` is the ground truth (e.g. ``knn_pairs_exact`` over a
    bounded sample); queries present only in ``approx`` are ignored
    (no truth to recall), queries missing entirely from ``approx`` score
    0.  One join + two aggregations; only the 3-number summary leaves the
    cluster."""
    e = exact.select(
        F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n")
    ).distinct()
    a = approx.select(
        F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n")
    ).distinct()
    per_q = (
        e.join(a.withColumn("__hit", F.lit(1)), ["__q", "__n"], "left")
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("__k"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("__hits"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.avg(F.col("__hits") / F.col("__k")).alias("mean_recall"),
            F.min(F.col("__hits") / F.col("__k")).alias("min_recall"),
        )
        .first()
    )
    if per_q is None or per_q["n_queries"] == 0:
        return {"n_queries": 0, "mean_recall": 1.0, "min_recall": 1.0}
    return {
        "n_queries": int(per_q["n_queries"]),
        "mean_recall": float(per_q["mean_recall"]),
        "min_recall": float(per_q["min_recall"]),
    }


def assert_pair_recall(
    approx_pairs: DataFrame,
    truth_pairs: DataFrame,
    min_recall: float,
    pair_cols: Sequence[str] = ("id_a", "id_b"),
) -> dict:
    """``pair_recall`` that raises when the measured recall is below the
    operator's documented bound — the pipeline-facing guard."""
    rep = pair_recall(approx_pairs, truth_pairs, pair_cols)
    if rep["recall"] < min_recall:
        raise AssertionError(
            f"approximate path recall {rep['recall']:.4f} < required "
            f"{min_recall} (hit {rep['n_hit']}/{rep['n_truth']} truth pairs)"
        )
    return rep
