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

Scale design: ONE action per report — pair_recall full-outer-joins the
two distinct-normalized pair sets with presence markers and aggregates
all three counts at once, so each side's distinct shuffle runs exactly
once; topk_recall is one left join + two aggregations.  Nothing is
collected but the few-number summary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
) -> dict:
    """Achieved recall of ``approx_pairs`` against ``truth_pairs``.

    Returns ``{"n_truth", "n_approx", "n_hit", "recall"}`` where
    ``recall = n_hit / n_truth`` (1.0 for an empty truth set — nothing
    was required, nothing was missed).  Pairs are compared as unordered
    id sets; duplicates on either side count once.

    ``truth_pairs`` is typically exact pairs over a bounded sample
    (``knn_pairs_exact``, ``jaccard_pairs`` on a sampled corpus).  All
    three counts come from ONE action — a full-outer join of the two
    distinct-normalized pair sets with presence markers — so each side's
    distinct shuffle runs exactly once (a count-then-join formulation
    evaluated the approximate side's distinct twice).
    """
    truth = _normalized_pairs(truth_pairs, pair_cols).withColumn(
        "__t", F.lit(1)
    )
    approx = _normalized_pairs(approx_pairs, pair_cols).withColumn(
        "__a", F.lit(1)
    )
    row = (
        truth.join(approx, ["__pa", "__pb"], "full_outer")
        .agg(
            F.coalesce(F.sum("__t"), F.lit(0)).alias("n_truth"),
            F.coalesce(F.sum("__a"), F.lit(0)).alias("n_approx"),
            F.coalesce(
                F.sum(F.when(F.col("__t").isNotNull() & F.col("__a").isNotNull(), 1)),
                F.lit(0),
            ).alias("n_hit"),
        )
        .first()
    )
    n_truth, n_approx, n_hit = int(row["n_truth"]), int(row["n_approx"]), int(row["n_hit"])
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
