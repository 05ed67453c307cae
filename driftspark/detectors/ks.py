"""Two-sample Kolmogorov-Smirnov detector — Spark-native.

Semantics parity with /root/reference/src/drift_autopsy/detectors/statistical/ks_test.py:
per numeric feature scipy-equivalent (D, p) (ks_test.py:95-110), optional
Bonferroni correction and the reference's "holm" quirk — its KSTest "holm"
is simplified to threshold/n, identical to Bonferroni (ks_test.py:127-130)
— aggregation max/mean/vote (ks_test.py:132-148), p-value relative severity
ladder (ks_test.py:153-163).

Spark execution: D for ALL features in one distributed job
(driftspark.stats.ks_d_all: melt → per-value pre-agg → per-feature
cumulative window); p-values from (D, n, m) on the driver via
driftspark.numerics (exact path-counting when max(n, m) <= 10^4 —
scipy's auto dispatch — else asymptotic).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

from driftspark.dataset import SparkDataset
from driftspark.detectors.base import BaseDriftDetector
from driftspark.numerics import ks_2samp_pvalue, severity_from_pvalue
from driftspark.registry import DetectorRegistry
from driftspark.results import DetectionResult, DriftSeverity
from driftspark.stats import ks_d_all

logger = logging.getLogger(__name__)


@DetectorRegistry.register("ks_test")
class KSTest(BaseDriftDetector):
    """KS drift detector (args mirror ks_test.py:37-47)."""

    def __init__(
        self,
        threshold: float = 0.05,
        correction: Optional[str] = None,
        aggregate_method: str = "max",
    ):
        super().__init__(name="ks_test")
        self.threshold = threshold
        self.correction = correction
        self.aggregate_method = aggregate_method

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

        d_all = ks_d_all(ref.df, test_data.df, numeric_cols)

        statistics, p_values = [], []
        feature_results: Dict[str, dict] = {}
        for col in numeric_cols:
            if col not in d_all:
                logger.warning("Skipping feature '%s': insufficient data", col)
                continue
            d, n, m = d_all[col]
            if n == 0 or m == 0:
                continue
            p = ks_2samp_pvalue(d, n, m)
            statistics.append(d)
            p_values.append(p)
            feature_results[col] = {"statistic": float(d), "p_value": float(p)}

        if not statistics:
            return DetectionResult(
                detector_name=self.name,
                drift_detected=False,
                severity=DriftSeverity.NONE,
                score=0.0,
                threshold=self.threshold,
            )

        adjusted_threshold = self.threshold
        if self.correction in ("bonferroni", "holm"):
            # reference quirk: KSTest "holm" == bonferroni (ks_test.py:127-130)
            adjusted_threshold = self.threshold / len(p_values)

        if self.aggregate_method == "mean":
            aggregated_score = float(np.mean(statistics))
            aggregated_p = float(np.mean(p_values))
        elif self.aggregate_method == "vote":
            drift_count = sum(p < adjusted_threshold for p in p_values)
            aggregated_score = drift_count / len(p_values)
            aggregated_p = float(np.min(p_values))
        else:  # "max" and unknown values (ks_test.py:133-148)
            aggregated_score = float(np.max(statistics))
            aggregated_p = float(np.min(p_values))

        drift_detected = aggregated_p < adjusted_threshold
        severity = DriftSeverity(severity_from_pvalue(aggregated_p, adjusted_threshold))

        return DetectionResult(
            detector_name=self.name,
            drift_detected=drift_detected,
            severity=severity,
            score=aggregated_score,
            threshold=adjusted_threshold,
            p_value=aggregated_p,
            statistic=aggregated_score,
            metadata={
                "n_features_tested": len(statistics),
                "feature_results": feature_results,
                "correction": self.correction,
                "aggregate_method": self.aggregate_method,
            },
        )
