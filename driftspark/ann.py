"""Approximate / exact nearest-neighbor search over embedding columns.

Brute-force cosine top-k as the correctness baseline (pure column math:
zip_with + aggregate — JVM-side, no UDF), and a random-hyperplane LSH
variant as the scale path: deterministic hash-derived hyperplanes sign-hash
every vector into b-bit buckets; candidates = vectors sharing any signature
band; exact cosine re-rank on the (small) candidate set.
"""

from __future__ import annotations

import logging
from typing import List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity_col(vec_col: Column, query: Sequence[float]) -> Column:
    """cos(vec, query) as a whole-stage-codegen column expression."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.sum(np.asarray(query, dtype=np.float64) ** 2)))
    # try_divide: a zero-norm vector has no defined cosine — NULL (which
    # sorts last / fails every >= filter) instead of an ANSI-mode abort
    return F.try_divide(_dot(vec_col, q), _norm(vec_col) * F.lit(qn))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k against one query vector.

    Plan: one scan, cos as column math, TakeOrderedAndProject for the
    limit — no full sort, no shuffle of vectors."""
    cos = cosine_similarity_col(F.col(vec_col), query)
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (no data dependence)."""
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.standard_normal((n_planes, dim))


def seed_centroids(dim: int, k: int, seed: int = 42) -> np.ndarray:
    """Deterministic data-independent coarse centroids — the IVF analog of
    ``_hyperplanes``: a SQL oracle can inline the quantizer as literals and
    reproduce assignment/probe/search exactly.  For data-adaptive cells
    (better recall per probe) use ``IVFIndex.fit`` instead."""
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.standard_normal((k, dim))


def signature_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """b-bit sign signature: bit p set when dot(vec, plane_p) > 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in plane])
        sig = sig.bitwiseOR(
            F.when(_dot(vec_col, pl) > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """LSH-pruned cosine top-k: only vectors sharing at least one signature
    band with the query are exactly re-ranked.  Recall < 1 by construction;
    raise n_planes/bands for tighter buckets or more candidates.

    At 10^12 scale the signature is precomputed/persisted as a column and
    the band match becomes a partition-pruned scan."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    qv = np.asarray(query, dtype=np.float64)
    for p, plane in enumerate(planes):
        if float(plane @ qv) > 0:
            qsig |= 1 << p
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    sig = signature_expr(F.col(vec_col), planes)
    with_sig = df.withColumn("__sig", sig)
    cond = None
    for b in range(bands):
        qband = (qsig >> (b * bits_per_band)) & mask
        band_eq = (
            F.shiftrightunsigned(F.col("__sig"), b * bits_per_band).bitwiseAND(F.lit(mask))
            == F.lit(qband)
        )
        cond = band_eq if cond is None else (cond | band_eq)
    cands = with_sig.where(cond)
    cos = cosine_similarity_col(F.col(vec_col), query)
    return (
        cands.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket_size: int = 500,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane LSH.

    Sign-signature every vector against deterministic hyperplanes, band the
    signature (two vectors within a small angle share a band with high
    probability), equi-join per (band, band-bits) bucket with a hot-bucket
    guard, then verify candidates with the exact cosine.  Returns
    (id_a, id_b, cosine >= min_cosine), id_a < id_b.

    Recall is probabilistic (raise bands for higher recall, planes for
    precision); the all-pairs oracle is knn_pairs_exact."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None or first["d"] is None or int(first["d"]) < 0:
            # size(NULL) is NULL under ANSI but -1 under legacy semantics
            raise ValueError(
                f"cannot infer dim: empty input or NULL {vec_col} in first row"
                " — pass dim explicitly"
            )
        dim = int(first["d"])
    planes = _hyperplanes(dim, n_planes, seed)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    sig = signature_expr(F.col(vec_col), planes)
    with_sig = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), sig.alias("sig")
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("sig"), b * bits_per_band)
            .bitwiseAND(F.lit(mask))
            .alias("bucket"),
        )
        for b in range(bands)
    ]
    buckets = with_sig.select(
        "id", "vec", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "vec", "bb.band", "bb.bucket")
    # hot-bucket cap via groupBy partials + anti-join, not a count
    # window: the window would SORT the exploded table (n*bands rows,
    # each carrying the full embedding vector) once per self-join side;
    # the groupBy ships only (band, bucket, count) partials and AQE
    # broadcasts the (tiny) over-cap set (dedup.lsh_candidate_pairs
    # precedent)
    hot = (
        buckets.select("band", "bucket")
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_bucket_size)
        .select("band", "bucket")
    )
    sized = buckets.join(hot, ["band", "bucket"], "left_anti")
    a = sized.select("band", "bucket", F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = sized.select("band", "bucket", F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.try_divide(
        _dot(F.col("va"), F.col("vb")), _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        cand.withColumn("cosine", cos)
        .where(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def _kmeans_fit(X: np.ndarray, k: int, iters: int = 15, seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (numpy only).

    Seeded farthest-point-ish init (k-means++ style with fixed RNG), fixed
    iteration count — same centroids for the same input regardless of
    partitioning."""
    rng = np.random.Generator(np.random.Philox(key=seed))
    n = len(X)
    k = min(k, n)
    centroids = np.empty((k, X.shape[1]))
    centroids[0] = X[int(rng.integers(n))]
    d2 = np.sum((X - centroids[0]) ** 2, axis=1)
    for i in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        centroids[i] = X[int(rng.choice(n, p=probs))]
        d2 = np.minimum(d2, np.sum((X - centroids[i]) ** 2, axis=1))
    for _ in range(iters):
        dists = (
            np.sum(X**2, axis=1)[:, None]
            - 2 * X @ centroids.T
            + np.sum(centroids**2, axis=1)[None, :]
        )
        assign = dists.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


class IVFIndex:
    """Inverted-file ANN index: coarse k-means centroids fitted on a
    driver-side sample; every vector is assigned its nearest centroid
    (one Arrow-batched matmul pass); queries probe only the ``n_probe``
    nearest cells.

    The scale story: persist ``assign(df)`` output PARTITIONED BY
    ``centroid_id`` (parquet/Iceberg) — a probe then becomes a
    partition-pruned scan of n_probe/k of the data, no index service
    needed."""

    def __init__(self, n_centroids: int = 64, seed: int = 42, sample_rows: int = 100_000):
        self.n_centroids = n_centroids
        self.seed = seed
        self.sample_rows = sample_rows
        self.centroids: np.ndarray | None = None

    def fit(self, df: DataFrame, vec_col: str) -> "IVFIndex":
        # content-keyed hash top-k with a BOUNDED merge (sampling.py): the
        # hash-quantile pre-filter keeps the final TakeOrdered merge at
        # ~margin*n rows instead of n_partitions*n.  Ordering
        # unconditionally also makes the SAMPLE ROW ORDER content-keyed,
        # so the index-based k-means++ init really is layout-independent
        # (an unordered small-table collect was not).
        from driftspark.sampling import content_keyed_top_n

        sample = content_keyed_top_n(
            df.select(vec_col), self.sample_rows, F.xxhash64(vec_col)
        )
        X = np.array(sample.toPandas()[vec_col].tolist(), dtype=np.float64)
        self.centroids = _kmeans_fit(X, self.n_centroids, seed=self.seed)
        return self

    def assign(self, df: DataFrame, vec_col: str) -> DataFrame:
        """Append centroid_id — vectorized pandas UDF (one matmul per
        Arrow batch against the broadcast centroid matrix)."""
        C = self.centroids
        c_sq = np.sum(C**2, axis=1)

        def nearest(v: pd.Series) -> pd.Series:
            X = np.array(v.tolist(), dtype=np.float64)
            d = np.sum(X**2, axis=1)[:, None] - 2 * X @ C.T + c_sq[None, :]
            return pd.Series(d.argmin(axis=1).astype(np.int32))

        nearest_udf = F.pandas_udf(nearest, "int")
        return df.withColumn("centroid_id", nearest_udf(F.col(vec_col)))

    def probe_cells(self, query: Sequence[float], n_probe: int) -> List[int]:
        q = np.asarray(query, dtype=np.float64)
        d = np.sum((self.centroids - q) ** 2, axis=1)
        # stable sort: equidistant cells tie-break by centroid id, matching
        # the SQL oracle's ORDER BY (distance, centroid_id)
        return [int(i) for i in np.argsort(d, kind="stable")[:n_probe]]

    def search(
        self,
        assigned_df: DataFrame,
        id_col: str,
        vec_col: str,
        query: Sequence[float],
        k: int = 10,
        n_probe: int = 8,
    ) -> DataFrame:
        """Exact cosine top-k within the probed cells (recall < 1 when the
        true neighbors live outside the probed cells).  Output keeps each
        hit's ``centroid_id`` so callers (and the driver oracle) can verify
        cell assignment alongside the ranking."""
        cells = self.probe_cells(query, n_probe)
        cand = assigned_df.where(F.col("centroid_id").isin(cells))
        cos = cosine_similarity_col(F.col(vec_col), query)
        return (
            cand.select(F.col(id_col), F.col("centroid_id"), cos.alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k)
        )

    def search_many(
        self,
        assigned_df: DataFrame,
        id_col: str,
        vec_col: str,
        queries_df: DataFrame,
        query_id_col: str,
        query_vec_col: str,
        k: int = 10,
        n_probe: int = 8,
        broadcast_queries: bool | None = None,
        broadcast_row_limit: int = 1_000_000,
    ) -> DataFrame:
        """Distributed multi-query probe-pruned search — the batch face of
        :meth:`search`: a TABLE of query vectors, each scored only against
        its ``n_probe`` nearest cells.  Returns
        ``(query_id, id, centroid_id, cosine, rank)`` with ``rank`` 1..k
        per query (ties by cosine break on id, matching ``search``).

        Plan shape: one vectorized pandas UDF assigns each query its probe
        cells (same stable argsort as ``probe_cells``), explodes to
        (query, cell) rows, and equi-joins the assigned corpus on
        ``centroid_id``.  The query side (queries x n_probe rows, each
        carrying its vector) is broadcast when small — the corpus then
        never shuffles, since ``centroid_id`` has only ``n_centroids``
        distinct values and a shuffle join on it would funnel each cell
        through one reducer.  With a large query batch
        (``broadcast_queries=False`` or above the limit) it degrades to
        that cell-keyed shuffle join deliberately: both sides cluster by
        cell, which is the IVF storage layout anyway (assign() output
        partitioned by centroid_id).  Top-k per query is a window
        partitioned by query id — parallel across queries."""
        from pyspark.sql import Window

        C = self.centroids
        if C is None:
            raise ValueError("index not fitted: call fit() or set centroids")
        n_probe = min(n_probe, len(C))
        c_sq = np.sum(C**2, axis=1)

        def probe(v: pd.Series) -> pd.Series:
            X = np.array(v.tolist(), dtype=np.float64)
            d = np.sum(X**2, axis=1)[:, None] - 2 * X @ C.T + c_sq[None, :]
            order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
            return pd.Series([row.astype(np.int32).tolist() for row in order])

        probe_udf = F.pandas_udf(probe, "array<int>")
        q = queries_df.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qv"),
            F.explode(probe_udf(F.col(query_vec_col))).alias("centroid_id"),
        )
        if broadcast_queries is None:
            # column-pruned count; note the queries lineage still executes
            # once for this probe and once for the search — pass an
            # explicit broadcast_queries when queries_df derives from an
            # expensive plan
            broadcast_queries = (
                queries_df.select(query_id_col).count() * n_probe
                <= broadcast_row_limit
            )
        right = F.broadcast(q) if broadcast_queries else q
        cos = F.try_divide(
            _dot(F.col(vec_col), F.col("__qv")),
            _norm(F.col(vec_col)) * _norm(F.col("__qv")),
        )
        scored = assigned_df.join(right, "centroid_id").select(
            "query_id",
            F.col(id_col),
            "centroid_id",
            cos.alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )


def _valid_vec(vec_col, dim: int):
    """Moment-path validity predicate: exact ``dim`` AND every element
    non-NULL and non-NaN.  A NULL element would be SKIPPED by F.sum while
    n counts the row (biased mean); either a NULL (arriving in pandas as
    NaN) or a real NaN element poisons the cumulative streaming (s, q)
    state for its dimensions forever (z=NaN never crosses a threshold).
    Batch and streaming must share this guard (CLAUDE.md guard-parity
    rule).  NULL arrays fail both conjuncts (NULL → row dropped)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return (F.size(c) == dim) & F.forall(
        c, lambda x: x.isNotNull() & ~F.isnan(x.cast("double"))
    )


def _warn_invalid_vecs(tagged_raw: DataFrame, dim: int, where: str) -> None:
    """Count + warn rows the moment paths drop (wrong dim / NULL or NaN
    element / NULL array) — the psi/chi2 null-part convention: observable,
    never silent.  One extra column-pruned job: only the wide-dim
    Summarizer paths use this; the codegen moment paths fold the bad-row
    count into their single aggregation scan (``valid_col``)."""
    bad = (
        tagged_raw.where(~F.coalesce(_valid_vec("__v", dim), F.lit(False)))
        .groupBy("__side")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    _warn_bad_counts({r["__side"]: r["c"] for r in bad if r["c"]}, where)


def _warn_bad_counts(bad_by_side: dict, where: str) -> None:
    if bad_by_side:
        detail = ", ".join(
            f"side {s}: {bad_by_side[s]}" for s in sorted(bad_by_side)
        )
        logger.warning(
            "%s: dropped rows with wrong-dim/NULL/NaN-element embeddings "
            "(%s); they are excluded from the moments",
            where, detail,
        )


def _embedding_moment_frame(tagged: DataFrame, dim: int, valid_col=None) -> DataFrame:
    """Per-side count + per-dimension sum / sum-of-squares as ONE
    aggregation over 2*dim+1 expressions (two result rows).  Split out so
    the plan tests can assert map-side partial aggregation and the
    absence of any Generate/explode node on the real plan.

    ``valid_col``: a boolean validity expression — the frame is then the
    RAW (unfiltered) union, invalid rows are excluded via conditional
    aggregation inside the SAME scan, and an ``n_bad`` column reports the
    per-side drop count so callers can warn without a second pass over
    the vector column.  Element access uses try_element_at (NULL out of
    range) so wrong-dim rows can flow through the untaken branch safely
    under ANSI."""
    if valid_col is None:
        el = [F.col("__v").getItem(j).cast("double") for j in range(dim)]
        aggs = [F.count(F.lit(1)).alias("n")]
        for j in range(dim):
            aggs.append(F.sum(el[j]).alias(f"s{j}"))
            aggs.append(F.sum(el[j] * el[j]).alias(f"q{j}"))
        return tagged.groupBy("__side").agg(*aggs)
    ok = F.coalesce(valid_col, F.lit(False))
    aggs = [
        F.sum(ok.cast("long")).alias("n"),
        F.sum((~ok).cast("long")).alias("n_bad"),
    ]
    for j in range(dim):
        e = F.when(
            ok, F.try_element_at(F.col("__v"), F.lit(j + 1)).cast("double")
        )
        aggs.append(F.sum(e).alias(f"s{j}"))
        aggs.append(F.sum(e * e).alias(f"q{j}"))
    return tagged.groupBy("__side").agg(*aggs)


def embedding_drift(
    ref: DataFrame,
    test: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    z_threshold: float = 4.0,
    max_codegen_dim: int = 256,
) -> DataFrame:
    """Per-dimension embedding-distribution drift between two corpora.

    For each dimension j: reference/test mean, population std (ddof=0, the
    engine's np.std convention), mean shift, and the Welch two-sample
    z-score ``shift / sqrt(ref_var/n_ref + test_var/n_test)``; ``drifted``
    flags ``|z| >= z_threshold``.

    Scale design: ONE column-pruned scan per side.  At modest dims the
    scan feeds 2*dim+1 partial sum expressions (sum, sum-of-squares per
    dimension) — map-side combine reduces every partition to a single
    row, so the shuffle carries O(partitions x dim) floats and there is
    NO posexplode of n x dim element rows.  Above ``max_codegen_dim``
    (wide real-world embeddings: 768/1536 would bloat whole-stage codegen
    with thousands of expressions) the same moments come from ONE
    pyspark.ml ``Summarizer`` aggregate over a Vector column — a single
    JVM-side vector accumulator per partition, identical shuffle shape.
    Both paths return dim rows regardless of corpus size.  ``dim``
    defaults to the first row's length and is validated loudly (same
    convention as the LSH/IVF plane checks)."""
    if dim is None:
        first = ref.select(F.size(vec_col).alias("d")).first()
        if first is None or first["d"] is None or int(first["d"]) < 0:
            # size(NULL) is NULL under ANSI but -1 under legacy semantics
            raise ValueError(
                "embedding_drift: empty reference or NULL embedding in first"
                " row — pass dim explicitly"
            )
        dim = int(first["d"])

    tagged_raw = ref.select(
        F.lit(0).alias("__side"), F.col(vec_col).alias("__v")
    ).unionByName(
        test.select(F.lit(1).alias("__side"), F.col(vec_col).alias("__v"))
    )
    if dim <= max_codegen_dim:
        # single scan: moments AND the invalid-row count ride one
        # conditional aggregation (valid_col) — no separate warn job
        collected = _embedding_moment_frame(
            tagged_raw, dim, valid_col=_valid_vec("__v", dim)
        ).collect()
        _warn_bad_counts(
            {r["__side"]: r["n_bad"] for r in collected if r["n_bad"]},
            "embedding_drift",
        )
        stats = {}
        for r in collected:
            n = r["n"]
            if n == 0:
                continue  # a side with only invalid rows has no moments
            mean = np.array([r[f"s{j}"] / n for j in range(dim)])
            var = np.maximum(
                np.array([r[f"q{j}"] / n for j in range(dim)]) - mean * mean, 0.0
            )
            stats[r["__side"]] = (n, mean, var)
    else:
        _warn_invalid_vecs(tagged_raw, dim, "embedding_drift")
        tagged = tagged_raw.where(_valid_vec("__v", dim))
        from pyspark.ml.functions import array_to_vector
        from pyspark.ml.stat import Summarizer

        vec = tagged.select(
            "__side", array_to_vector(F.col("__v").cast("array<double>")).alias("__v")
        )
        collected = vec.groupBy("__side").agg(
            Summarizer.metrics("mean", "variance", "count")
            .summary(F.col("__v"))
            .alias("s")
        ).collect()
        stats = {}
        for r in collected:
            n = int(r["s"]["count"])
            mean = np.asarray(r["s"]["mean"].toArray(), dtype=np.float64)
            # Summarizer variance is ddof=1; the engine convention is
            # population (ddof=0)
            var = np.maximum(
                np.asarray(r["s"]["variance"].toArray(), dtype=np.float64)
                * (max(n - 1, 0) / n),
                0.0,
            )
            stats[r["__side"]] = (n, mean, var)

    if 0 not in stats or 1 not in stats:
        raise ValueError(
            f"embedding_drift: a side has no rows of dimension {dim} "
            f"(sides present: {sorted(stats)})"
        )

    out = {
        "dim": [], "ref_mean": [], "test_mean": [], "mean_shift": [],
        "ref_std": [], "test_std": [], "z": [], "drifted": [],
    }
    (n0, mean0, var0), (n1, mean1, var1) = stats[0], stats[1]
    for j in range(dim):
        m0, m1 = mean0[j], mean1[j]
        v0, v1 = var0[j], var1[j]
        shift = m1 - m0
        z = shift / ((v0 / n0 + v1 / n1) ** 0.5 + 1e-12)
        out["dim"].append(j)
        out["ref_mean"].append(m0)
        out["test_mean"].append(m1)
        out["mean_shift"].append(shift)
        out["ref_std"].append(v0 ** 0.5)
        out["test_std"].append(v1 ** 0.5)
        out["z"].append(z)
        out["drifted"].append(bool(abs(z) >= z_threshold))
    spark = ref.sparkSession
    return spark.createDataFrame(
        pd.DataFrame(out),
        "dim int, ref_mean double, test_mean double, mean_shift double, "
        "ref_std double, test_std double, z double, drifted boolean",
    )


def knn_pairs_exact(
    df: DataFrame, id_col: str, vec_col: str, k: int = 5, max_rows: int = 20000
) -> DataFrame:
    """All-pairs k-NN by cosine for moderate tables (cross-join bounded by
    ``max_rows``) — the verification oracle for the LSH path."""
    n = df.count()
    if n > max_rows:
        raise ValueError(f"knn_pairs_exact is O(n^2); {n} rows > {max_rows}")
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = F.try_divide(
        _dot(F.col("va"), F.col("vb")), _norm(F.col("va")) * _norm(F.col("vb"))
    )
    pairs = a.join(b, F.col("id_a") != F.col("id_b")).select(
        "id_a", "id_b", cos.alias("cosine")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.col("id_b"))
    return pairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
