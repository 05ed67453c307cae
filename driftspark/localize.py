"""Univariate drift localization — Spark-native.

Semantics parity with /root/reference/src/drift_autopsy/localizers/univariate.py:
KS per numeric feature with moment dist_info (univariate.py:45-69, np.std =
population std), chi-square per categorical feature over aligned counts
with the min-samples OR filter (univariate.py:71-122), Bonferroni or REAL
Holm per-rank thresholds (univariate.py:213-219 — unlike the KSTest
detector's simplified "holm"), the >= severity ladder (univariate.py:234-243),
sort by p-value ascending and optional top_k (univariate.py:257-261).

Spark execution: all KS D statistics in one distributed job (ks_d_all),
all moment stats in one aggregation per side, one small groupBy per
categorical feature; scalar chi-square/p-values/Holm ranking on the driver.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from driftspark.dataset import SparkDataset
from driftspark.numerics import chisquare, ks_2samp_pvalue, severity_from_pvalue_ge
from driftspark.registry import LocalizerRegistry
from driftspark.results import (
    DetectionResult,
    DriftSeverity,
    FeatureDrift,
    LocalizationResult,
)
from driftspark.stats import categorical_counts, ks_d_all, mode_of, moment_stats

logger = logging.getLogger(__name__)


class BaseDriftLocalizer:
    """Base localizer (reference core/localizer.py shape)."""

    def __init__(self, name: str):
        self._name = name

    @property
    def name(self) -> str:
        return self._name

    def localize(
        self,
        reference_data: SparkDataset,
        test_data: SparkDataset,
        drift_signal: Optional[DetectionResult] = None,
    ) -> LocalizationResult:
        raise NotImplementedError


@LocalizerRegistry.register("slice")
class SliceLocalizer(BaseDriftLocalizer):
    """Slice-based drift localization — fills the reference's declared but
    never-implemented ``slice_drifts`` surface (result.py:66-67 carries the
    field; no reference localizer populates it).

    Splits the test data by a metadata column (slice key: partition,
    source, group...) and runs the per-feature KS test of every slice
    against the GLOBAL reference distribution, so drift is attributed to
    (slice, feature) cells.  Distributed: one grouped-KS job for all
    slices x features (driftspark.verdicts.ks_d_by_partition_broadcast)."""

    def __init__(
        self,
        slice_col: str,
        threshold: float = 0.05,
        correction: Optional[str] = "bonferroni",
    ):
        super().__init__(name="slice")
        self.slice_col = slice_col
        self.threshold = threshold
        self.correction = correction

    def localize(
        self,
        reference_data: SparkDataset,
        test_data: SparkDataset,
        drift_signal: Optional[DetectionResult] = None,
    ) -> LocalizationResult:
        from driftspark.verdicts import ks_d_by_partition_broadcast

        numeric_cols = [
            c
            for c in reference_data.numeric_features
            if c in test_data.df.columns and c != self.slice_col
        ]
        if not numeric_cols:
            return LocalizationResult(method_name=self.name, feature_drifts=[])
        # each test slice compares against the GLOBAL reference distribution
        # (north-rule per-partition verdict semantics): fitted once, then
        # one grouped job scores all slices x features.  Slice values map
        # to dense int ids because the grouped-KS output schema keys int
        # partitions; the map translates back afterwards.
        from pyspark.sql import functions as F

        slices = sorted(
            r["s"]
            for r in test_data.df.select(F.col(self.slice_col).alias("s"))
            .where(F.col(self.slice_col).isNotNull())
            .distinct()
            .collect()
        )
        id_of = {s: i for i, s in enumerate(slices)}
        part_expr = F.lit(None).cast("int")
        for s, i in id_of.items():
            part_expr = F.when(F.col(self.slice_col) == s, F.lit(i)).otherwise(part_expr)
        test_by_slice = test_data.df.withColumn("part", part_expr)
        d_rows = ks_d_by_partition_broadcast(
            reference_data.df, test_by_slice, numeric_cols, part_col="part"
        ).collect()
        name_of = {i: s for s, i in id_of.items()}
        n_tests = max(len(d_rows), 1)
        adj = self.threshold / n_tests if self.correction == "bonferroni" else self.threshold
        slice_drifts: dict = {}
        feature_drifts = []
        for r in d_rows:
            d, n, m = float(r["d"]), int(r["n"]), int(r["m"])
            p = ks_2samp_pvalue(d, n, m)
            detected = p < adj
            sev = DriftSeverity(severity_from_pvalue_ge(p, adj))
            key = str(name_of.get(r["part"], r["part"]))
            slice_drifts.setdefault(key, {})[r["feature"]] = {
                "statistic": d,
                "p_value": p,
                "drift_detected": detected,
                "severity": sev.value,
            }
            feature_drifts.append(
                FeatureDrift(
                    feature_name=f"{r['feature']}@{key}",
                    drift_detected=detected,
                    score=d,
                    p_value=p,
                    severity=sev,
                )
            )
        feature_drifts.sort(key=lambda x: x.p_value)
        return LocalizationResult(
            method_name=self.name,
            feature_drifts=feature_drifts,
            slice_drifts=slice_drifts,
            metadata={
                "slice_col": self.slice_col,
                "n_slices": len(slices),
                "threshold": adj,
                "correction": self.correction,
                "note": "reference slice == global reference distribution",
            },
        )


@LocalizerRegistry.register("univariate")
class UnivariateLocalizer(BaseDriftLocalizer):
    """Per-feature statistical-test localization (args: univariate.py:32-43)."""

    def __init__(
        self,
        threshold: float = 0.05,
        correction: Optional[str] = "bonferroni",
        top_k: Optional[int] = None,
        min_samples_categorical: int = 5,
    ):
        super().__init__(name="univariate")
        self.threshold = threshold
        self.correction = correction
        self.top_k = top_k
        self.min_samples_categorical = min_samples_categorical

    def _test_categorical(self, ref_df, test_df, col: str) -> tuple:
        cats, ref_counts, test_counts = categorical_counts(ref_df, test_df, col)
        valid = (ref_counts >= self.min_samples_categorical) | (
            test_counts >= self.min_samples_categorical
        )
        if valid.sum() < 2:
            return 0.0, 1.0, {"message": "Insufficient categories"}
        ref_valid = ref_counts[valid]
        test_valid = test_counts[valid]
        ref_proportions = ref_valid / ref_valid.sum()
        expected = ref_proportions * test_valid.sum()
        try:
            stat, p = chisquare(test_valid, expected)
            dist_info = {
                "n_categories": len(cats),
                "n_tested_categories": int(valid.sum()),
                "ref_mode": mode_of(ref_df, col),
                "test_mode": mode_of(test_df, col),
            }
            return float(stat), float(p), dist_info
        except Exception as e:  # noqa: BLE001 — mirror reference tolerance
            logger.warning("Chi-square test failed for '%s': %s", col, e)
            return 0.0, 1.0, {"error": str(e)}

    def localize(
        self,
        reference_data: SparkDataset,
        test_data: SparkDataset,
        drift_signal: Optional[DetectionResult] = None,
    ) -> LocalizationResult:
        ref = reference_data
        feature_drifts = []

        numeric_cols = [c for c in ref.numeric_features if c in test_data.df.columns]
        if numeric_cols:
            d_all = ks_d_all(ref.df, test_data.df, numeric_cols)
            ref_moments = moment_stats(ref.df, numeric_cols)
            test_moments = moment_stats(test_data.df, numeric_cols)
            for col in numeric_cols:
                if col not in d_all:
                    continue
                d, n, m = d_all[col]
                if n == 0 or m == 0:
                    continue
                p = ks_2samp_pvalue(d, n, m)
                rm, rs = ref_moments[col]
                tm, ts = test_moments[col]
                feature_drifts.append(
                    {
                        "name": col,
                        "type": "numeric",
                        "statistic": float(d),
                        "p_value": float(p),
                        "dist_info": {
                            "ref_mean": rm,
                            "ref_std": rs,
                            "test_mean": tm,
                            "test_std": ts,
                            "mean_shift": tm - rm,
                            "std_shift": ts - rs,
                        },
                    }
                )

        for col in ref.categorical_features:
            if col not in test_data.df.columns:
                continue
            stat, p, dist_info = self._test_categorical(ref.df, test_data.df, col)
            feature_drifts.append(
                {
                    "name": col,
                    "type": "categorical",
                    "statistic": stat,
                    "p_value": p,
                    "dist_info": dist_info,
                }
            )

        if not feature_drifts:
            return LocalizationResult(method_name=self.name, feature_drifts=[])

        p_values = np.array([fd["p_value"] for fd in feature_drifts])
        adjusted_threshold = self.threshold
        sorted_indices = None
        adjusted_thresholds = None
        if self.correction == "bonferroni":
            adjusted_threshold = self.threshold / len(p_values)
        elif self.correction == "holm":
            # real per-rank Holm thresholds (univariate.py:216-219, 225-227)
            sorted_indices = np.argsort(p_values)
            adjusted_thresholds = self.threshold / (
                len(p_values) - np.arange(len(p_values))
            )

        feature_drift_objects = []
        for i, fd in enumerate(feature_drifts):
            if self.correction == "holm":
                idx_in_sorted = int(np.where(sorted_indices == i)[0][0])
                threshold_for_feature = float(adjusted_thresholds[idx_in_sorted])
            else:
                threshold_for_feature = adjusted_threshold
            drift_detected = fd["p_value"] < threshold_for_feature
            severity = DriftSeverity(
                severity_from_pvalue_ge(fd["p_value"], threshold_for_feature)
            )
            feature_drift_objects.append(
                FeatureDrift(
                    feature_name=fd["name"],
                    drift_detected=drift_detected,
                    score=fd["statistic"],
                    p_value=fd["p_value"],
                    severity=severity,
                    distribution_shift=fd["dist_info"],
                )
            )

        feature_drift_objects.sort(key=lambda x: x.p_value)
        if self.top_k is not None:
            feature_drift_objects = feature_drift_objects[: self.top_k]
        n_drifted = sum(1 for fd in feature_drift_objects if fd.drift_detected)

        return LocalizationResult(
            method_name=self.name,
            feature_drifts=feature_drift_objects,
            metadata={
                "threshold": adjusted_threshold,
                "correction": self.correction,
                "n_tested": len(feature_drifts),
                "n_drifted": n_drifted,
            },
        )
