"""Two-sample Wasserstein-1 (earth-mover) detector — beyond-reference.

The reference's numeric detectors (PSI, KS — see
/root/reference/src/drift_autopsy/detectors/statistical/) are either
binned (PSI loses within-bin movement) or saturating (KS D caps at 1 and
ignores HOW FAR the mass moved).  W1 is the scale-bearing complement: it
equals the area between the two empirical CDFs, so a shift of 2 sigma
scores twice a shift of 1 sigma.  There is no reference analog to port —
semantics follow scipy.stats.wasserstein_distance's empirical-CDF
quantile-integral identity, computed fully distributed by
driftspark.stats.wasserstein_all (per-value pre-agg -> per-feature
cumulative window, bucketed decomposition above 4M distinct values).

Scores are reported RAW (same unit as the feature) and NORMALIZED by the
reference population std (scale-free, comparable across features): a
normalized W1 of t means the distributions differ by t reference
standard deviations of transported mass.  The drift verdict uses the
normalized score; severity is a documented ratio ladder on
score/threshold (1x none-boundary, 1.5x low, 2x medium, 3x high beyond).
"""

from __future__ import annotations

import logging
import math
from typing import Dict

import numpy as np

from driftspark.dataset import SparkDataset
from driftspark.detectors.base import BaseDriftDetector
from driftspark.registry import DetectorRegistry
from driftspark.results import DetectionResult, DriftSeverity
from driftspark.stats import moment_stats, wasserstein_all

logger = logging.getLogger(__name__)


def severity_from_ratio(ratio: float) -> str:
    """Severity from score/threshold: < 1 none, < 1.5 low, < 2 medium,
    < 3 high, else critical (strict <, detector convention)."""
    if not math.isfinite(ratio):
        return "critical"
    if ratio < 1.0:
        return "none"
    if ratio < 1.5:
        return "low"
    if ratio < 2.0:
        return "medium"
    if ratio < 3.0:
        return "high"
    return "critical"


@DetectorRegistry.register("wasserstein")
class WassersteinDistance(BaseDriftDetector):
    """W1 drift detector over every numeric feature.

    Args:
        threshold: normalized-W1 drift cutoff (default 0.1 — one tenth
            of a reference std of transported mass).
        aggregate_method: "max" (default) or "mean" over features.
    """

    def __init__(self, threshold: float = 0.1, aggregate_method: str = "max"):
        super().__init__(name="wasserstein")
        self.threshold = threshold
        self.aggregate_method = aggregate_method
        self._ref_stats: Dict[str, tuple] = {}

    def fit(self, reference_data: SparkDataset) -> None:
        super().fit(reference_data)
        # one tiny aggregate pass: per-feature reference (mean, pop std)
        # for the scale-free normalization
        self._ref_stats = moment_stats(
            reference_data.df, reference_data.numeric_features
        )

    def detect(self, test_data: SparkDataset) -> DetectionResult:
        self._require_fitted()
        ref = self._reference_data
        numeric_cols = [
            c for c in ref.numeric_features if c in test_data.df.columns
        ]
        if not numeric_cols:
            return DetectionResult(
                detector_name=self.name,
                drift_detected=False,
                severity=DriftSeverity.NONE,
                score=0.0,
                threshold=self.threshold,
                metadata={"message": "No numeric features"},
            )

        w_all = wasserstein_all(ref.df, test_data.df, numeric_cols)

        normalized = []
        feature_results: Dict[str, dict] = {}
        for col in numeric_cols:
            if col not in w_all:
                logger.warning("Skipping feature '%s': insufficient data", col)
                continue
            w1, n, m = w_all[col]
            std = self._ref_stats.get(col, (float("nan"), float("nan")))[1]
            if not math.isfinite(std):
                logger.warning("Skipping feature '%s': no reference std", col)
                continue
            if std > 0:
                norm = w1 / std
            else:
                # constant reference: any transported mass is infinite in
                # std units; identical constants are zero drift
                norm = 0.0 if w1 == 0.0 else float("inf")
            normalized.append(norm)
            feature_results[col] = {
                "w1": float(w1),
                "w1_normalized": float(norm),
                "n_ref": n,
                "m_test": m,
            }

        if not normalized:
            return DetectionResult(
                detector_name=self.name,
                drift_detected=False,
                severity=DriftSeverity.NONE,
                score=0.0,
                threshold=self.threshold,
            )

        if self.aggregate_method == "mean":
            aggregated = float(np.mean(normalized))
        else:  # "max" and unknown values (detector-family convention)
            aggregated = float(np.max(normalized))

        drift_detected = aggregated >= self.threshold
        severity = DriftSeverity(
            severity_from_ratio(aggregated / self.threshold)
        )
        return DetectionResult(
            detector_name=self.name,
            drift_detected=drift_detected,
            severity=severity,
            score=aggregated,
            threshold=self.threshold,
            statistic=aggregated,
            metadata={
                "n_features_tested": len(normalized),
                "feature_results": feature_results,
                "aggregate_method": self.aggregate_method,
            },
        )
