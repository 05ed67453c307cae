"""driftspark — a PySpark-native schema/constraint validation and
drift-detection engine.

From-scratch reimplementation of the query semantics of
``ei-akuloff/data-drift-autopsy`` (reference read-only at /root/reference)
on the Spark DataFrame API: per-partition column statistics, uniqueness /
referential constraints, PSI / KS / chi-square / CBPE drift detection,
univariate localization, image-payload validation, and checkpoint/resume —
designed for 10^12-row Iceberg/parquet tables.
"""

from driftspark.dataset import SparkDataset
from driftspark.pipeline import DriftPipeline
from driftspark.registry import DetectorRegistry, LocalizerRegistry, RCARegistry
from driftspark.results import (
    DetectionResult,
    DriftSeverity,
    FeatureDrift,
    HallucinationResult,
    LocalizationResult,
    PipelineResult,
    RCAResult,
)

# importing subpackages registers components
from driftspark import detectors as _detectors  # noqa: F401
from driftspark import localize as _localize  # noqa: F401
from driftspark import rca as _rca  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "SparkDataset",
    "DriftPipeline",
    "DetectorRegistry",
    "LocalizerRegistry",
    "RCARegistry",
    "DetectionResult",
    "DriftSeverity",
    "FeatureDrift",
    "HallucinationResult",
    "LocalizationResult",
    "PipelineResult",
    "RCAResult",
]
