"""Pipeline orchestration — validate → detect → localize → rca.

Same driver-side control flow as the reference
(/root/reference/src/drift_autopsy/core/pipeline.py:18-213): registry
resolution of string names (pipeline.py:56-83), hard failure on
validation/detection, error-swallowing on localization and RCA
(pipeline.py:154-157, 173-176), wall-clock timing (110, 180-181), and the
same PipelineResult metadata keys (193-200).  Each stage issues Spark jobs.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Optional, Union

from driftspark.dataset import SparkDataset
from driftspark.registry import DetectorRegistry, LocalizerRegistry, RCARegistry
from driftspark.results import PipelineResult
from driftspark.validators import DataValidator

logger = logging.getLogger(__name__)


class DriftPipeline:
    """Composable drift-analysis pipeline (constructor args mirror
    reference pipeline.py:46-55)."""

    def __init__(
        self,
        detector: Union[Any, str],
        localizer: Optional[Union[Any, str]] = None,
        rca: Optional[Union[Any, str]] = None,
        enable_localization: bool = True,
        enable_rca: bool = False,
        validate_data: bool = True,
        model: Optional[Any] = None,
    ):
        self.detector = (
            DetectorRegistry.create(detector) if isinstance(detector, str) else detector
        )
        self.enable_localization = enable_localization and localizer is not None
        if self.enable_localization:
            self.localizer = (
                LocalizerRegistry.create(localizer)
                if isinstance(localizer, str)
                else localizer
            )
        else:
            self.localizer = None
        self.enable_rca = enable_rca and rca is not None
        if self.enable_rca:
            self.rca = RCARegistry.create(rca) if isinstance(rca, str) else rca
        else:
            self.rca = None
        self.validate_data = validate_data
        self.model = model

    def run(
        self, reference_data: SparkDataset, test_data: SparkDataset
    ) -> PipelineResult:
        start_time = time.time()

        if self.validate_data:
            DataValidator.validate_dataset(reference_data, name="reference")
            DataValidator.validate_dataset(test_data, name="test")
            DataValidator.validate_compatibility(reference_data, test_data)

        logger.info("[1/3] drift detection with %s", self.detector.name)
        detection_result = self.detector.fit_detect(reference_data, test_data)

        localization_result = None
        if self.enable_localization:
            logger.info("[2/3] drift localization with %s", self.localizer.name)
            try:
                localization_result = self.localizer.localize(
                    reference_data, test_data, drift_signal=detection_result
                )
            except Exception as e:  # noqa: BLE001 — pipeline.py:154-157
                logger.error("Drift localization failed: %s", e)
                localization_result = None

        rca_result = None
        if self.enable_rca:
            logger.info("[3/3] RCA with %s", self.rca.name)
            try:
                rca_result = self.rca.analyze(
                    reference_data,
                    test_data,
                    localization=localization_result,
                    model=self.model,
                )
            except Exception as e:  # noqa: BLE001 — pipeline.py:173-176
                logger.error("RCA failed: %s", e)
                rca_result = None

        execution_time = time.time() - start_time
        return PipelineResult(
            detection=detection_result,
            localization=localization_result,
            rca=rca_result,
            execution_time_seconds=execution_time,
            metadata={
                "detector": self.detector.name,
                "localizer": self.localizer.name if self.localizer else None,
                "rca": self.rca.name if self.rca else None,
                "reference_samples": reference_data.n_samples,
                "test_samples": test_data.n_samples,
                "n_features": reference_data.n_features,
            },
        )

    def __repr__(self) -> str:
        components = [f"detector={self.detector.name}"]
        if self.enable_localization:
            components.append(f"localizer={self.localizer.name}")
        if self.enable_rca:
            components.append(f"rca={self.rca.name}")
        return f"DriftPipeline({', '.join(components)})"
