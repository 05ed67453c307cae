"""Cramér–von Mises + Anderson–Darling two-sample detector — beyond-reference.

The reference ships KS and PSI
(/root/reference/src/drift_autopsy/detectors/statistical/); there is no
analog to port.  CvM and AD complete the CDF-distance family:

- KS takes only the single largest CDF gap — insensitive to broad,
  low-amplitude distortion.
- CvM T integrates the SQUARED gap over the whole pooled distribution —
  sensitive to diffuse shape changes KS dilutes.
- AD A² is CvM with 1/(H(1-H)) weighting — up-weights the tails, the
  region that matters for outlier-regime drift (and the one PSI's
  equal-mass bins see least).

Both statistics for ALL features come from ONE distributed job
(driftspark.stats.cvm_ad_all: the same melt -> per-value pre-agg ->
cumulative-window shape as KS/W1, bucketed above 4M distinct values).
AD gets a real p-value on the driver: the Scholz–Stephens (1987) null
standardization + critical-table interpolation, reimplemented scipy-free
in driftspark.numerics (Monte-Carlo-verified in tests).  CvM's
p is gated on the asymptotic omega² critical values instead (the exact
null quantiles 0.347/0.461/0.743/1.168 at 10%/5%/1%/0.1% — Anderson &
Darling 1952 Table 1): its limiting distribution's CDF needs Bessel-K
series machinery that would add no detection power.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from driftspark.dataset import SparkDataset
from driftspark.detectors.base import BaseDriftDetector
from driftspark.numerics import (
    anderson_darling_2samp_p,
    anderson_darling_2samp_sigma,
    severity_from_pvalue,
)
from driftspark.registry import DetectorRegistry
from driftspark.results import DetectionResult, DriftSeverity
from driftspark.stats import cvm_ad_all

logger = logging.getLogger(__name__)

# asymptotic upper critical values of the omega^2 (CvM limiting) null
# distribution at alpha = 0.10 / 0.05 / 0.01 / 0.001
CVM_CRIT_10 = 0.347
CVM_CRIT_05 = 0.461
CVM_CRIT_01 = 0.743
CVM_CRIT_001 = 1.168


def severity_from_cvm(t: float) -> str:
    """Severity from the CvM statistic against the published asymptotic
    null quantiles: < 10% crit none, < 5% low, < 1% medium, < 0.1% high,
    else critical (strict <, detector convention)."""
    if not np.isfinite(t):
        return "critical"
    if t < CVM_CRIT_10:
        return "none"
    if t < CVM_CRIT_05:
        return "low"
    if t < CVM_CRIT_01:
        return "medium"
    if t < CVM_CRIT_001:
        return "high"
    return "critical"


@DetectorRegistry.register("cvm")
class CvMAndersonDarling(BaseDriftDetector):
    """CvM + AD drift detector over every numeric feature.

    Args:
        statistic: which statistic gates the verdict — "cvm" (default;
            drift iff max T >= ``threshold``) or "ad" (drift iff min
            Scholz-Stephens p < ``alpha``, KS-detector convention).  Both
            statistics are always reported per feature.
        threshold: CvM T cutoff (default 0.461 — the asymptotic 5%
            critical value).
        alpha: AD significance level (default 0.05), used when
            statistic="ad".
        aggregate_method: "max" (default) or "mean" over features.
    """

    def __init__(
        self,
        statistic: str = "cvm",
        threshold: float = CVM_CRIT_05,
        alpha: float = 0.05,
        aggregate_method: str = "max",
    ):
        if statistic not in ("cvm", "ad"):
            raise ValueError(f"statistic must be 'cvm' or 'ad', got {statistic!r}")
        super().__init__(name="cvm")
        self.statistic = statistic
        self.threshold = threshold
        self.alpha = alpha
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

        stats_all = cvm_ad_all(ref.df, test_data.df, numeric_cols)

        cvm_vals, ad_ps = [], []
        feature_results: Dict[str, dict] = {}
        for col in numeric_cols:
            if col not in stats_all:
                logger.warning("Skipping feature '%s': insufficient data", col)
                continue
            cvm, ad, n, m = stats_all[col]
            sigma = anderson_darling_2samp_sigma(n, m)
            ad_std = (ad - 1.0) / sigma if sigma > 0 else float("nan")
            ad_p = anderson_darling_2samp_p(ad_std)
            cvm_vals.append(cvm)
            ad_ps.append(ad_p)
            feature_results[col] = {
                "cvm": float(cvm),
                "ad": float(ad),
                "ad_standardized": float(ad_std),
                "ad_p_value": float(ad_p),
                "n_ref": n,
                "m_test": m,
            }

        if not cvm_vals:
            return DetectionResult(
                detector_name=self.name,
                drift_detected=False,
                severity=DriftSeverity.NONE,
                score=0.0,
                threshold=self.threshold,
            )

        if self.aggregate_method == "mean":
            agg_cvm = float(np.mean(cvm_vals))
            agg_p = float(np.mean(ad_ps))
        else:  # "max" and unknown values (detector-family convention)
            agg_cvm = float(np.max(cvm_vals))
            agg_p = float(np.min(ad_ps))

        if self.statistic == "ad":
            drift_detected = agg_p < self.alpha
            severity = DriftSeverity(severity_from_pvalue(agg_p, self.alpha))
            score, p_value, threshold = agg_p, agg_p, self.alpha
        else:
            drift_detected = agg_cvm >= self.threshold
            severity = DriftSeverity(severity_from_cvm(agg_cvm))
            score, p_value, threshold = agg_cvm, None, self.threshold

        return DetectionResult(
            detector_name=self.name,
            drift_detected=drift_detected,
            severity=severity,
            score=score,
            threshold=threshold,
            p_value=p_value,
            statistic=agg_cvm,
            metadata={
                "n_features_tested": len(cvm_vals),
                "feature_results": feature_results,
                "statistic_gate": self.statistic,
                "aggregate_method": self.aggregate_method,
            },
        )
