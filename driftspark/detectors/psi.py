"""Population Stability Index detector — Spark-native.

Semantics parity with /root/reference/src/drift_autopsy/detectors/statistical/psi.py:
quantile bin edges fitted once on the reference split (psi.py:52-84),
both sides histogrammed against those fixed edges (psi.py:149-154),
missing/empty bins effectively clamped to ``min_bin_size`` (psi.py:102-103,
157, 186), PSI = sum((a - e) * ln(a / e)) after renormalization
(psi.py:105-110), absolute severity ladder 0.1/0.2/0.3/0.5 (psi.py:218-227).

Spark execution: fit() is one Greenwald-Khanna sketch pass by default
(``exact_edges=True`` restores the exact weighted-percentile plan for
bit-level qcut parity); detect() is ONE explode-melt aggregation job over
union(ref, test) covering every numeric feature x bin AND every
categorical column (map-side partial aggregation — the shuffle carries
only O(features x bins) state).  The scalar PSI over the aligned
~n_features x n_bins histogram runs on the driver via the identical numpy
formula — bit-equal to the reference given the same edges.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from driftspark.dataset import SparkDataset
from driftspark.detectors.base import BaseDriftDetector
from driftspark.numerics import (
    hellinger_from_proportions,
    js_divergence_from_proportions,
    psi_from_proportions,
    severity_from_psi,
)
from driftspark.registry import DetectorRegistry
from driftspark.results import DetectionResult, DriftSeverity
from driftspark.stats import (
    approx_quantile_edges,
    psi_counts_fused,
    quantile_edges,
)

logger = logging.getLogger(__name__)

# one-time (per process) notice that the scale default is approximate —
# parity-sensitive callers should see it exactly once, not per fit
_approx_default_notified = False


@DetectorRegistry.register("psi")
class PSI(BaseDriftDetector):
    """PSI drift detector (see module docstring for parity contract).

    Args mirror the reference (psi.py:38-49): threshold (default 0.2),
    n_bins (10), min_bin_size (0.001), aggregate_method ("max"|"mean").
    """

    def __init__(
        self,
        threshold: float = 0.2,
        n_bins: int = 10,
        min_bin_size: float = 0.001,
        aggregate_method: str = "max",
        exact_edges: bool = False,
        quantile_relative_error: float = 1e-4,
        extra_divergences: bool = False,
    ):
        super().__init__(name="psi")
        self.threshold = threshold
        self.n_bins = n_bins
        self.min_bin_size = min_bin_size
        self.aggregate_method = aggregate_method
        # opt-in: also report Jensen-Shannon + Hellinger per feature from
        # the SAME fused histogram job (no extra scan, beyond-reference
        # additions; drift verdict/severity stay pure PSI for parity)
        self.extra_divergences = extra_divergences
        # scale default: Greenwald-Khanna approximate edges (one sketch
        # pass, no value shuffle); exact_edges=True restores bit-level
        # pd.qcut parity via the exact weighted-percentile plan
        self.exact_edges = exact_edges
        self.quantile_relative_error = quantile_relative_error
        self._bin_edges: Dict[str, np.ndarray] = {}

    def fit(self, reference_data: SparkDataset) -> None:
        super().fit(reference_data)
        if not self.exact_edges:
            global _approx_default_notified
            if not _approx_default_notified:
                _approx_default_notified = True
                logger.warning(
                    "PSI uses Greenwald-Khanna approximate bin edges by "
                    "default (rank error <= %g); pass exact_edges=True for "
                    "bit-exact pd.qcut parity with the reference "
                    "(same convention as HallucinationRiskDetector's "
                    "exact_distance_percentile)",
                    self.quantile_relative_error,
                )
        fit_edges = quantile_edges if self.exact_edges else (
            lambda df, cols, q: approx_quantile_edges(
                df, cols, q, self.quantile_relative_error
            )
        )
        self._bin_edges = fit_edges(
            reference_data.df, reference_data.numeric_features, self.n_bins
        )
        logger.info("PSI fitted: %d binned features", len(self._bin_edges))

    def detect(self, test_data: SparkDataset) -> DetectionResult:
        self._require_fitted()
        ref = self._reference_data
        psi_values = []
        feature_results: Dict[str, dict] = {}

        # ONE job for everything: numeric histograms (all features x bins)
        # and every categorical column's aligned counts
        edges_map = {
            c: e for c, e in self._bin_edges.items() if c in test_data.df.columns
        }
        cat_cols = [
            c for c in ref.categorical_features if c in test_data.df.columns
        ]
        hists, cat_counts = psi_counts_fused(ref.df, test_data.df, edges_map, cat_cols)
        for col, (ref_p, test_p) in hists.items():
            if ref_p.sum() == 0 or test_p.sum() == 0:
                logger.warning("Skipping feature '%s': insufficient data", col)
                continue
            psi = psi_from_proportions(ref_p, test_p, self.min_bin_size)
            psi_values.append(psi)
            feature_results[col] = {
                "psi": float(psi),
                "n_bins": len(edges_map[col]) - 1,
            }
            if self.extra_divergences:
                feature_results[col]["js_divergence"] = (
                    js_divergence_from_proportions(ref_p, test_p)
                )
                feature_results[col]["hellinger"] = (
                    hellinger_from_proportions(ref_p, test_p)
                )

        for col in cat_cols:
            rc, tc = cat_counts[col]
            if len(rc) == 0:
                continue
            # `.align(fill_value=min_bin_size)` parity (psi.py:182-186):
            # categories missing on a side enter at min_bin_size
            rn, tn = rc.sum(), tc.sum()
            ref_p = np.where(rc > 0, rc / (rn if rn else 1.0), self.min_bin_size)
            test_p = np.where(tc > 0, tc / (tn if tn else 1.0), self.min_bin_size)
            psi = psi_from_proportions(ref_p, test_p, self.min_bin_size)
            psi_values.append(psi)
            feature_results[col] = {"psi": float(psi), "n_categories": len(ref_p)}
            if self.extra_divergences:
                # raw aligned counts — the divergences renormalize and
                # need no missing-side clamp (0-terms vanish natively)
                feature_results[col]["js_divergence"] = (
                    js_divergence_from_proportions(rc, tc)
                )
                feature_results[col]["hellinger"] = (
                    hellinger_from_proportions(rc, tc)
                )

        if not psi_values:
            return DetectionResult(
                detector_name=self.name,
                drift_detected=False,
                severity=DriftSeverity.NONE,
                score=0.0,
                threshold=self.threshold,
            )

        if self.aggregate_method == "mean":
            aggregated = float(np.mean(psi_values))
        else:  # "max" and any unknown value fall back to max (psi.py:208-213)
            aggregated = float(np.max(psi_values))

        drift_detected = aggregated >= self.threshold
        severity = DriftSeverity(severity_from_psi(aggregated))

        return DetectionResult(
            detector_name=self.name,
            drift_detected=drift_detected,
            severity=severity,
            score=aggregated,
            threshold=self.threshold,
            metadata={
                "n_features_tested": len(psi_values),
                "feature_results": feature_results,
                "aggregate_method": self.aggregate_method,
            },
        )
