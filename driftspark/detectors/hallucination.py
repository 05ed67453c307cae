"""Hallucination-risk detector — confidence vs training-distribution density.

Semantics parity with
/root/reference/src/drift_autopsy/detectors/hallucination/confidence_density.py:
flag a sample when confidence >= confidence_threshold AND normalized
distance >= distance_threshold (confidence_density.py:263-266); composite
score = confidence * normalized_distance (:261); normalization by the
reference distance percentile (default p95) with +1e-10 guard and [0,1]
clip (:256-258); confidence = max softmax for (n,k) probas, max(p, 1-p)
for binary (:445-474); flagged-rate severity ladder (:62-77); quadrant
counts (result.py:211-231).  Density backends: mahalanobis / knn /
isolation_forest / kde (:195-202, 369-422).

Spark execution (the flagship "no per-row Python" surface):
* confidence is pure column math (array_max / greatest / clip);
* Mahalanobis fit is a distributed two-pass moment aggregation (means,
  then mean-imputed cross-products → np.cov ddof=1 parity), pinv on the
  driver over the tiny d x d matrix, and scoring is a VECTORIZED pandas
  UDF evaluating the einsum over Arrow batches with (mu, VI) broadcast;
* knn / kde / isolation_forest fit on a deterministic content-keyed
  reference sample collected to the driver, then score in the same
  broadcast-state pandas UDF pattern;
* the reference percentile is an exact distributed percentile over the
  UDF-scored reference DataFrame;
* per-row outputs stay in a DataFrame (at 10^12 rows they are written,
  not collected); aggregates/quadrants are one aggregation job.
"""

from __future__ import annotations

import logging
import math
from typing import Dict, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from driftspark.dataset import SparkDataset
from driftspark.detectors.base import BaseDriftDetector
from driftspark.numerics import severity_from_flag_rate
from driftspark.registry import DetectorRegistry
from driftspark.sampling import content_keyed_top_n
from driftspark.results import DriftSeverity, HallucinationResult

logger = logging.getLogger(__name__)

# one-time (per process) notice that the scale default is approximate
_approx_default_notified = False


def _distance_fn(state: Dict):
    """Pure function (broadcast-state) computing raw distances for a
    numpy batch — shared by the pandas UDF and driver-side fitting."""
    method = state["method"]

    if method == "mahalanobis":
        mean, VI = state["mean"], state["VI"]

        def fn(X):
            delta = X - mean
            dist_sq = np.einsum("ij,jk,ik->i", delta, VI, delta)
            return np.sqrt(np.maximum(dist_sq, 0.0))

    elif method == "knn":
        R, k = state["ref"], state["k"]

        def fn(X):
            out = np.empty(len(X))
            for s in range(0, len(X), 1024):
                chunk = X[s : s + 1024]
                d2 = (
                    np.sum(chunk**2, axis=1)[:, None]
                    + np.sum(R**2, axis=1)[None, :]
                    - 2 * chunk @ R.T
                )
                np.maximum(d2, 0.0, out=d2)
                kk = min(k, R.shape[0])
                part = np.partition(np.sqrt(d2), kk - 1, axis=1)[:, :kk]
                out[s : s + 1024] = part.mean(axis=1)
            return out

    elif method == "kde":
        R, h, d = state["ref"], state["bandwidth"], state["ref"].shape[1]
        log_norm = math.log(len(R)) + 0.5 * d * math.log(2 * math.pi * h * h)

        def fn(X):
            out = np.empty(len(X))
            for s in range(0, len(X), 1024):
                chunk = X[s : s + 1024]
                d2 = (
                    np.sum(chunk**2, axis=1)[:, None]
                    + np.sum(R**2, axis=1)[None, :]
                    - 2 * chunk @ R.T
                )
                np.maximum(d2, 0.0, out=d2)
                z = -0.5 * d2 / (h * h)
                zmax = z.max(axis=1)
                log_density = zmax + np.log(np.exp(z - zmax[:, None]).sum(axis=1)) - log_norm
                out[s : s + 1024] = -log_density
            return out

    elif method == "isolation_forest":
        model = state["model"]

        def fn(X):
            return -model.score_samples(X)

    else:
        raise RuntimeError(f"Unknown density_method: {method}")
    return fn


@DetectorRegistry.register("hallucination_risk")
class HallucinationRiskDetector(BaseDriftDetector):
    """Per-sample hallucination risk (args mirror confidence_density.py:95-163)."""

    def __init__(
        self,
        density_method: str = "mahalanobis",
        confidence_threshold: float = 0.80,
        distance_threshold: float = 0.50,
        distance_percentile: float = 95.0,
        n_neighbors: int = 5,
        iso_n_estimators: int = 200,
        kde_bandwidth="scott",
        random_state: Optional[int] = 42,
        max_ref_sample: int = 20000,
        exact_distance_percentile: bool = False,
        sample_hash: str = "xxhash64",
        sample_key_cols=None,
    ):
        super().__init__(name="hallucination_risk")
        self.density_method = density_method
        self.confidence_threshold = confidence_threshold
        self.distance_threshold = distance_threshold
        self.distance_percentile = distance_percentile
        self.n_neighbors = n_neighbors
        self.iso_n_estimators = iso_n_estimators
        self.kde_bandwidth = kde_bandwidth
        self.random_state = random_state
        self.max_ref_sample = max_ref_sample
        # sample_hash="xxhash64" (default): JVM-intrinsic content hash with
        # the bounded-merge pre-filter — the scale path.  "md5": ordering by
        # md5(concat_ws('|', sample_key_cols)) — engine-portable so an
        # external SQL engine (the DuckDB driver oracle) reproduces the
        # knn/kde reference sample EXACTLY (same convention as MMD's).
        self.sample_hash = sample_hash
        self.sample_key_cols = list(sample_key_cols) if sample_key_cols else None
        if sample_hash not in ("xxhash64", "md5"):
            raise ValueError(
                f"sample_hash must be 'xxhash64' or 'md5', got {sample_hash!r}"
            )
        if sample_hash == "md5" and not self.sample_key_cols:
            raise ValueError("sample_hash='md5' requires sample_key_cols")
        # scale default: GK-sketch percentile of the reference distances
        # (exact percentile buffers the full distinct multiset into one
        # final agg task — not viable at 10^12 rows); True restores the
        # np.percentile-exact parity path
        self.exact_distance_percentile = exact_distance_percentile
        self._state: Optional[Dict] = None
        self._impute_means: Optional[Dict[str, float]] = None
        self._cols: Optional[list] = None
        self._ref_distance_percentile: Optional[float] = None

    # -- helpers ---------------------------------------------------------

    def _imputed(self, df: DataFrame) -> DataFrame:
        """Mean-impute (reference confidence_density.py:442) using the
        REFERENCE means for both sides when fitted."""
        sel = [
            F.coalesce(
                F.nanvl(F.col(c).cast("double"), F.lit(None)),
                F.lit(self._impute_means[c]),
            ).alias(c)
            for c in self._cols
        ]
        return df.select(*sel)

    def _collect_ref_sample(self, df: DataFrame) -> np.ndarray:
        n = df.count()
        if n > self.max_ref_sample:
            if self.sample_hash == "md5":
                h = F.md5(
                    F.concat_ws(
                        "|", *[F.col(k).cast("string") for k in self.sample_key_cols]
                    )
                )
                df = df.orderBy(h, *self.sample_key_cols).limit(self.max_ref_sample)
            else:
                df = content_keyed_top_n(
                    df, self.max_ref_sample, F.xxhash64(*self._cols), self._cols, total=n
                )
        return self._imputed(df).toPandas().values.astype(np.float64)

    def _dist_udf(self):
        state = self._state
        fn = _distance_fn(state)

        @F.pandas_udf("double")
        def udf(*cols: pd.Series) -> pd.Series:
            X = np.column_stack([c.values.astype(np.float64) for c in cols])
            return pd.Series(fn(X))

        return udf

    def _confidence_col(self, ds: SparkDataset) -> Column:
        if ds.proba_col is None:
            raise ValueError(
                "test_data prediction probabilities (proba_col) are required "
                "for hallucination detection."
            )
        dt = dict((f.name, f.dataType) for f in ds.df.schema.fields)[ds.proba_col]
        if isinstance(dt, ArrayType):
            conf = F.array_max(F.col(ds.proba_col).cast("array<double>"))
        else:
            p = F.col(ds.proba_col).cast("double")
            conf = F.greatest(p, F.lit(1.0) - p)
        return F.least(F.greatest(conf, F.lit(0.0)), F.lit(1.0))

    # -- fit ---------------------------------------------------------------

    def fit(self, reference_data: SparkDataset) -> None:
        super().fit(reference_data)
        self._cols = reference_data.numeric_features
        if not self._cols:
            raise ValueError(
                "HallucinationRiskDetector requires at least one numeric feature."
            )
        df = reference_data.df

        # pass 1: means for imputation
        means_row = df.agg(
            *[F.mean(F.nanvl(F.col(c).cast("double"), F.lit(None))).alias(c) for c in self._cols]
        ).first()
        self._impute_means = {
            c: float(means_row[c]) if means_row[c] is not None else 0.0
            for c in self._cols
        }

        if self.density_method == "mahalanobis":
            # pass 2: mean-imputed cross-products → np.cov (ddof=1) parity
            imp = self._imputed(df)
            aggs = [F.count(F.lit(1)).alias("__n")]
            for i, a in enumerate(self._cols):
                aggs.append(F.sum(F.col(a)).alias(f"s||{a}"))
                for b in self._cols[i:]:
                    aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"x||{a}||{b}"))
            row = imp.agg(*aggs).first()
            n = row["__n"]
            d = len(self._cols)
            mu = np.array([row[f"s||{c}"] / n for c in self._cols])
            cov = np.zeros((d, d))
            for i, a in enumerate(self._cols):
                for j_, b in enumerate(self._cols[i:], start=i):
                    sxy = row[f"x||{a}||{b}"]
                    cov[i, j_] = cov[j_, i] = (sxy - n * mu[i] * mu[j_]) / (n - 1)
            self._state = {
                "method": "mahalanobis",
                "mean": mu,
                "VI": np.linalg.pinv(cov),
            }
        elif self.density_method == "knn":
            R = self._collect_ref_sample(df)
            self._state = {"method": "knn", "ref": R, "k": self.n_neighbors}
        elif self.density_method == "isolation_forest":
            from driftspark.iforest import IsolationForest

            R = self._collect_ref_sample(df)
            model = IsolationForest(
                n_estimators=self.iso_n_estimators, random_state=self.random_state
            ).fit(R)
            self._state = {"method": "isolation_forest", "model": model}
        elif self.density_method == "kde":
            R = self._collect_ref_sample(df)
            bw = self.kde_bandwidth
            if bw == "scott":
                n_, d_ = R.shape
                bw = n_ ** (-1.0 / (d_ + 4))  # Scott's rule (confidence_density.py:358-360)
            self._state = {"method": "kde", "ref": R, "bandwidth": float(bw)}
        else:
            raise ValueError(f"Unknown density_method: {self.density_method}")

        # distributed percentile of reference distances (exact behind the
        # parity flag, GK sketch by default — see __init__)
        scored = self._imputed(df).withColumn(
            "__dist", self._dist_udf()(*[F.col(c) for c in self._cols])
        )
        p = self.distance_percentile / 100.0
        if self.exact_distance_percentile:
            self._ref_distance_percentile = float(
                scored.agg(F.percentile("__dist", F.lit(p)).alias("p")).first()["p"]
            )
        else:
            global _approx_default_notified
            if not _approx_default_notified:
                _approx_default_notified = True
                logger.warning(
                    "hallucination_risk uses an approximate reference "
                    "distance percentile by default (GK sketch, rank error "
                    "<= 1e-4); pass exact_distance_percentile=True for "
                    "bit-exact np.percentile parity with the reference "
                    "(same convention as PSI's exact_edges)"
                )
            self._ref_distance_percentile = float(
                scored.approxQuantile("__dist", [p], 1e-4)[0]
            )

    # -- detect -------------------------------------------------------------

    def detect(self, test_data: SparkDataset) -> HallucinationResult:
        if not self._fitted:
            raise RuntimeError(
                "HallucinationRiskDetector must be fitted before calling detect()."
            )
        conf_col = self._confidence_col(test_data)
        id_cols = [c for c in test_data.metadata_cols if c in test_data.df.columns]

        imputed_feats = [
            F.coalesce(
                F.nanvl(F.col(c).cast("double"), F.lit(None)),
                F.lit(self._impute_means[c]),
            ).alias(f"__f_{c}")
            for c in self._cols
        ]
        base = test_data.df.select(*id_cols, conf_col.alias("confidence"), *imputed_feats)
        scored = base.withColumn(
            "__raw", self._dist_udf()(*[F.col(f"__f_{c}") for c in self._cols])
        )
        norm = F.least(
            F.greatest(
                F.col("__raw") / F.lit(self._ref_distance_percentile + 1e-10),
                F.lit(0.0),
            ),
            F.lit(1.0),
        )
        rows = scored.select(
            *id_cols,
            "confidence",
            norm.alias("norm_distance"),
            (F.col("confidence") * norm).alias("hallucination_score"),
            (
                (F.col("confidence") >= self.confidence_threshold)
                & (norm >= self.distance_threshold)
            ).alias("flagged"),
        )

        agg = rows.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("flagged").cast("long")).alias("n_risk"),
            F.mean("confidence").alias("mean_conf"),
            F.mean("norm_distance").alias("mean_dist"),
            F.mean("hallucination_score").alias("mean_score"),
            F.sum(
                (
                    (F.col("norm_distance") < self.distance_threshold)
                    & (F.col("confidence") >= self.confidence_threshold)
                ).cast("long")
            ).alias("safe"),
            F.sum(
                (
                    (F.col("norm_distance") >= self.distance_threshold)
                    & (F.col("confidence") < self.confidence_threshold)
                ).cast("long")
            ).alias("uncertain_honest"),
            F.sum(
                (
                    (F.col("norm_distance") >= self.distance_threshold)
                    & (F.col("confidence") >= self.confidence_threshold)
                ).cast("long")
            ).alias("hallucination_risk"),
            F.sum(
                (
                    (F.col("norm_distance") < self.distance_threshold)
                    & (F.col("confidence") < self.confidence_threshold)
                ).cast("long")
            ).alias("uncertain_safe"),
        ).first()

        n = int(agg["n"])
        n_risk = int(agg["n_risk"] or 0)
        rate = n_risk / n if n > 0 else 0.0
        return HallucinationResult(
            detector_name=self.name,
            n_hallucination_risk=n_risk,
            hallucination_rate=rate,
            severity=DriftSeverity(severity_from_flag_rate(rate)),
            confidence_threshold=self.confidence_threshold,
            distance_threshold=self.distance_threshold,
            quadrant_counts={
                k: int(agg[k])
                for k in ("safe", "uncertain_honest", "hallucination_risk", "uncertain_safe")
            },
            rows=rows,
            metadata={
                "density_method": self.density_method,
                "n_test_samples": n,
                "mean_confidence": float(agg["mean_conf"]),
                "mean_normalised_distance": float(agg["mean_dist"]),
                "mean_hallucination_score": float(agg["mean_score"]),
                "ref_distance_percentile_value": self._ref_distance_percentile,
            },
        )

    def fit_detect(self, reference_data, test_data) -> HallucinationResult:
        self.fit(reference_data)
        return self.detect(test_data)
