"""Configuration schema + loader + pipeline/data construction glue.

Schema parity with /root/reference/src/drift_autopsy/config/schema.py:7-77
(same field names/defaults/validators) and loader semantics with
config/loader.py:21-144 (yaml.safe_load / json → validated pydantic).
Additions over the reference:
* a ``spark`` block (shuffle partitions, AQE, master, extra conf) — the
  knobs a cluster deployment needs;
* ``build_pipeline(config)`` — the from-config construction glue the
  reference documents but never implements (its demo wires pipelines by
  hand, examples/quickstart/folktables_demo.py:84-111);
* ``load_dataset(spark, data_config)`` — DataConfig → SparkDataset over
  csv/parquet/iceberg-table sources.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml
from pydantic import BaseModel, Field, field_validator

from driftspark.dataset import SparkDataset
from driftspark.pipeline import DriftPipeline


class DetectorConfig(BaseModel):
    type: str = Field(..., description="Detector type/name (as registered)")
    threshold: Optional[float] = Field(None, ge=0.0, le=1.0)
    params: Dict[str, Any] = Field(default_factory=dict)

    @field_validator("type")
    @classmethod
    def validate_type(cls, v: str) -> str:
        if not v or not v.strip():
            raise ValueError("Detector type cannot be empty")
        return v.strip()


class LocalizerConfig(BaseModel):
    type: str = Field(..., description="Localizer type/name")
    params: Dict[str, Any] = Field(default_factory=dict)


class RCAConfig(BaseModel):
    type: str = Field(..., description="RCA analyzer type/name")
    params: Dict[str, Any] = Field(default_factory=dict)


class DataConfig(BaseModel):
    reference_path: str = Field(...)
    test_path: str = Field(...)
    format: str = Field(
        default="csv", description="csv | parquet | json | orc | table"
    )
    target_col: Optional[str] = None
    feature_cols: Optional[List[str]] = None
    metadata_cols: Optional[List[str]] = None
    proba_col: Optional[str] = None
    prediction_col: Optional[str] = None


class SparkConfig(BaseModel):
    """Engine-deployment knobs (not in the reference — Spark-specific)."""

    master: Optional[str] = None
    shuffle_partitions: Optional[int] = None
    extra_conf: Dict[str, str] = Field(default_factory=dict)


class PipelineConfig(BaseModel):
    name: str = Field(...)
    detector: DetectorConfig = Field(...)
    localizer: Optional[LocalizerConfig] = None
    rca: Optional[RCAConfig] = None
    data: Optional[DataConfig] = None
    spark: Optional[SparkConfig] = None
    enable_localization: bool = True
    enable_rca: bool = False
    metadata: Dict[str, Any] = Field(default_factory=dict)


class ConfigLoader:
    """YAML/JSON → validated PipelineConfig (loader.py:21-144 semantics)."""

    @staticmethod
    def from_yaml(path: str | Path) -> PipelineConfig:
        with open(path) as f:
            data = yaml.safe_load(f)
        return PipelineConfig(**data)

    @staticmethod
    def from_json(path: str | Path) -> PipelineConfig:
        with open(path) as f:
            data = json.load(f)
        return PipelineConfig(**data)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> PipelineConfig:
        return PipelineConfig(**data)


def build_pipeline(config: PipelineConfig) -> DriftPipeline:
    """Construct a DriftPipeline from a validated config (the glue the
    reference leaves to callers)."""
    from driftspark.registry import DetectorRegistry, LocalizerRegistry, RCARegistry

    det_kwargs = dict(config.detector.params)
    if config.detector.threshold is not None:
        det_kwargs["threshold"] = config.detector.threshold
    detector = DetectorRegistry.create(config.detector.type, **det_kwargs)

    localizer = None
    if config.localizer is not None:
        localizer = LocalizerRegistry.create(
            config.localizer.type, **config.localizer.params
        )
    rca = None
    if config.rca is not None:
        rca = RCARegistry.create(config.rca.type, **config.rca.params)

    return DriftPipeline(
        detector=detector,
        localizer=localizer,
        rca=rca,
        enable_localization=config.enable_localization,
        enable_rca=config.enable_rca,
    )


def load_dataset(spark, data: DataConfig, side: str = "reference") -> SparkDataset:
    """DataConfig → SparkDataset (reference data/loaders.py:18-80 scope)."""
    path = data.reference_path if side == "reference" else data.test_path
    if data.format == "csv":
        df = spark.read.csv(path, header=True, inferSchema=True)
    elif data.format == "parquet":
        df = spark.read.parquet(path)
    elif data.format == "json":
        df = spark.read.json(path)
    elif data.format == "orc":
        df = spark.read.orc(path)
    elif data.format == "table":
        df = spark.read.table(path)
    else:
        raise ValueError(f"Unknown data format: {data.format}")
    return SparkDataset(
        df,
        feature_cols=data.feature_cols,
        target_col=data.target_col,
        prediction_col=data.prediction_col,
        proba_col=data.proba_col,
        metadata_cols=data.metadata_cols,
    )
