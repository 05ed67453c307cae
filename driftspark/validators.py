"""Dataset validation as aggregate-only Spark jobs.

Reproduces /root/reference/src/drift_autopsy/data/validators.py semantics
(min samples validators.py:45-50, missing counts 55-63, inf counts 65-73,
zero-variance 75-82, compatibility 107-137) but each dataset check is ONE
aggregation job (count + per-column sum(isnull)/sum(isinf)/stddev) —
no per-row Python, no collect of row data.
"""

from __future__ import annotations

import logging

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, NumericType

from driftspark.dataset import SparkDataset

logger = logging.getLogger(__name__)


class DataValidator:
    @staticmethod
    def validate_dataset(
        dataset: SparkDataset,
        name: str = "dataset",
        check_missing: bool = True,
        check_inf: bool = True,
        check_variance: bool = True,
        min_samples: int = 10,
    ) -> dict:
        """Validate and log warnings; raises on < min_samples.

        Returns the computed stats dict (count, missing, inf, zero-variance)
        so callers can persist them as data-quality metrics rows.
        """
        df = dataset.df
        fields = {f.name: f.dataType for f in df.schema.fields}
        cols = dataset.feature_cols
        float_cols = [
            c for c in cols if isinstance(fields[c], (DoubleType, FloatType))
        ]
        numeric_cols = [c for c in cols if isinstance(fields[c], NumericType)]

        aggs = [F.count(F.lit(1)).alias("__n")]
        if check_missing:
            for c in cols:
                aggs.append(
                    F.sum(F.col(c).isNull().cast("long")).alias(f"miss||{c}")
                )
        if check_inf:
            for c in float_cols:
                aggs.append(
                    F.sum(
                        (
                            (F.col(c) == float("inf")) | (F.col(c) == float("-inf"))
                        ).cast("long")
                    ).alias(f"inf||{c}")
                )
        if check_variance:
            for c in numeric_cols:
                aggs.append(F.stddev_pop(F.col(c).cast("double")).alias(f"std||{c}"))

        row = df.agg(*aggs).first()
        n = row["__n"]
        if n < min_samples:
            raise ValueError(
                f"{name} has only {n} samples, minimum {min_samples} required"
            )

        stats = {"n_samples": int(n), "missing": {}, "inf": {}, "zero_variance": []}
        if check_missing:
            missing = {c: int(row[f"miss||{c}"] or 0) for c in cols}
            stats["missing"] = {c: v for c, v in missing.items() if v > 0}
            if stats["missing"]:
                logger.warning(
                    "%s has missing values in %d features: %s",
                    name,
                    len(stats["missing"]),
                    dict(list(stats["missing"].items())[:5]),
                )
        if check_inf:
            for c in float_cols:
                cnt = int(row[f"inf||{c}"] or 0)
                if cnt > 0:
                    stats["inf"][c] = cnt
                    logger.warning(
                        "%s has %d infinite values in feature '%s'", name, cnt, c
                    )
        if check_variance:
            for c in numeric_cols:
                std = row[f"std||{c}"]
                if std is not None and std == 0:
                    stats["zero_variance"].append(c)
                    logger.warning(
                        "%s has zero variance in feature '%s' (constant value)",
                        name,
                        c,
                    )
        return stats

    @staticmethod
    def validate_compatibility(
        reference: SparkDataset,
        test: SparkDataset,
        check_feature_names: bool = True,
        check_feature_order: bool = True,
    ) -> None:
        """Schema-only compatibility check (no jobs) — validators.py:107-137."""
        if reference.n_features != test.n_features:
            raise ValueError(
                f"Feature count mismatch: reference has {reference.n_features}, "
                f"test has {test.n_features}"
            )
        if check_feature_names:
            ref_features = set(reference.feature_names)
            test_features = set(test.feature_names)
            missing_in_test = ref_features - test_features
            extra_in_test = test_features - ref_features
            if missing_in_test:
                raise ValueError(
                    f"Features in reference but not in test: {missing_in_test}"
                )
            if extra_in_test:
                raise ValueError(
                    f"Features in test but not in reference: {extra_in_test}"
                )
        if check_feature_order:
            if reference.feature_names != test.feature_names:
                logger.warning(
                    "Feature order differs between reference and test. "
                    "This may affect some detectors."
                )
