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

# importing these registers the components (reference __init__ parity)
from driftspark.detectors import (
    CBPE,
    MMD,
    DomainClassifier,
    HallucinationRiskDetector,
    KSTest,
    PSI,
)
from driftspark.loaders import DataLoader
from driftspark.localize import UnivariateLocalizer
from driftspark.rca import (
    DistributionChangeRCA,
    PermutationImportanceRCA,
    SHAPAnalyzer,
)
from driftspark.streaming import StreamingDriftMonitor

__version__ = "0.1.0"

__all__ = [
    "DriftPipeline",
    "SparkDataset",
    "DetectionResult",
    "LocalizationResult",
    "RCAResult",
    "PipelineResult",
    "DriftSeverity",
    "FeatureDrift",
    "DetectorRegistry",
    "LocalizerRegistry",
    "RCARegistry",
    "KSTest",
    "PSI",
    "MMD",
    "DomainClassifier",
    "CBPE",
    "HallucinationRiskDetector",
    "HallucinationResult",
    "UnivariateLocalizer",
    "SHAPAnalyzer",
    "DistributionChangeRCA",
    "PermutationImportanceRCA",
    "StreamingDriftMonitor",
    "DataLoader",
]
