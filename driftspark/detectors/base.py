"""Base detector with the reference's fit/detect protocol
(/root/reference/src/drift_autopsy/core/detector.py:56-125)."""

from __future__ import annotations

from typing import Optional

from driftspark.dataset import SparkDataset
from driftspark.results import DetectionResult


class BaseDriftDetector:
    def __init__(self, name: str):
        self._name = name
        self._fitted = False
        self._reference_data: Optional[SparkDataset] = None

    @property
    def name(self) -> str:
        return self._name

    @property
    def fitted(self) -> bool:
        return self._fitted

    def fit(self, reference_data: SparkDataset) -> None:
        self._reference_data = reference_data
        self._fitted = True

    def detect(self, test_data: SparkDataset) -> DetectionResult:
        if not self._fitted:
            raise RuntimeError(
                f"Detector '{self.name}' must be fitted before calling detect()"
            )
        raise NotImplementedError("Subclasses must implement detect()")

    def fit_detect(
        self, reference_data: SparkDataset, test_data: SparkDataset
    ) -> DetectionResult:
        self.fit(reference_data)
        return self.detect(test_data)

    def _require_fitted(self) -> None:
        if not self._fitted:
            raise RuntimeError("Detector must be fitted before calling detect()")
