"""Correlation-structure drift detector — beyond-reference.

Every detector in the reference (and the PSI/KS/W1/CvM family here)
scores MARGINALS.  Two features whose marginals are unchanged but whose
relationship flips (x predicts y in reference, anti-predicts in test)
pass every univariate gate — this detector scores exactly that failure
mode: the max (or mean) absolute pairwise Pearson shift, computed by
driftspark.stats.correlation_drift in one fused corr aggregation per
side (ANSI-safe: zero-variance columns yield None, never an abort).

|delta r| lives on [0, 2], so thresholds are absolute: 0.2 (default)
means "some pair's correlation moved by 0.2".  Severity is the ratio
ladder shared with WassersteinDistance.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from driftspark.dataset import SparkDataset
from driftspark.detectors.base import BaseDriftDetector
from driftspark.detectors.wasserstein import severity_from_ratio
from driftspark.registry import DetectorRegistry
from driftspark.results import DetectionResult, DriftSeverity
from driftspark.stats import correlation_drift

logger = logging.getLogger(__name__)


@DetectorRegistry.register("correlation")
class CorrelationDrift(BaseDriftDetector):
    """Pairwise Pearson-shift drift detector over the numeric features.

    Args:
        threshold: absolute |delta r| drift cutoff (default 0.2).
        aggregate_method: "max" (default) or "mean" over pairs.
    """

    def __init__(self, threshold: float = 0.2, aggregate_method: str = "max"):
        super().__init__(name="correlation")
        self.threshold = threshold
        self.aggregate_method = aggregate_method

    def detect(self, test_data: SparkDataset) -> DetectionResult:
        self._require_fitted()
        ref = self._reference_data
        numeric_cols = [
            c for c in ref.numeric_features if c in test_data.df.columns
        ]
        d = correlation_drift(ref.df, test_data.df, numeric_cols)

        deltas = []
        feature_results: Dict[str, dict] = {}
        for (a, b), (rr, tt, delta) in sorted(d.items()):
            if delta is None:
                logger.warning(
                    "Skipping pair (%s, %s): correlation undefined on one "
                    "side (constant column)", a, b,
                )
                continue
            deltas.append(abs(delta))
            feature_results[f"{a}|{b}"] = {
                "ref_r": float(rr),
                "test_r": float(tt),
                "delta": float(delta),
            }

        if not deltas:
            return DetectionResult(
                detector_name=self.name,
                drift_detected=False,
                severity=DriftSeverity.NONE,
                score=0.0,
                threshold=self.threshold,
                metadata={"message": "No correlatable feature pairs"},
            )

        if self.aggregate_method == "mean":
            aggregated = float(np.mean(deltas))
        else:  # "max" and unknown values (detector-family convention)
            aggregated = float(np.max(deltas))

        drift_detected = aggregated >= self.threshold
        severity = DriftSeverity(severity_from_ratio(aggregated / self.threshold))
        return DetectionResult(
            detector_name=self.name,
            drift_detected=drift_detected,
            severity=severity,
            score=aggregated,
            threshold=self.threshold,
            metadata={
                "n_pairs_tested": len(deltas),
                "feature_results": feature_results,
                "aggregate_method": self.aggregate_method,
            },
        )
