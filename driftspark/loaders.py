"""Data loaders — API parity with reference data/loaders.py:13-80.

Same static-method surface (``DataLoader.from_csv`` / ``from_parquet``
with target/feature/metadata column kwargs) but returning SparkDatasets
over distributed reads; a SparkSession is the first argument since there
is no ambient session in a library context.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Union

from pyspark.sql import SparkSession

from driftspark.dataset import SparkDataset

logger = logging.getLogger(__name__)


class DataLoader:
    """General data loader supporting multiple formats."""

    @staticmethod
    def from_csv(
        spark: SparkSession,
        path: Union[str, Path],
        target_col: Optional[str] = None,
        feature_cols: Optional[List[str]] = None,
        metadata_cols: Optional[List[str]] = None,
        proba_col: Optional[str] = None,
        header: bool = True,
        infer_schema: bool = True,
        **read_options,
    ) -> SparkDataset:
        df = (
            spark.read.option("header", header)
            .option("inferSchema", infer_schema)
            .options(**read_options)
            .csv(str(path))
        )
        logger.info("Loaded CSV %s: %d columns", path, len(df.columns))
        return SparkDataset(
            df,
            feature_cols=feature_cols,
            target_col=target_col,
            metadata_cols=metadata_cols,
            proba_col=proba_col,
        )

    @staticmethod
    def from_parquet(
        spark: SparkSession,
        path: Union[str, Path],
        target_col: Optional[str] = None,
        feature_cols: Optional[List[str]] = None,
        metadata_cols: Optional[List[str]] = None,
        proba_col: Optional[str] = None,
        **read_options,
    ) -> SparkDataset:
        df = spark.read.options(**read_options).parquet(str(path))
        logger.info("Loaded parquet %s: %d columns", path, len(df.columns))
        return SparkDataset(
            df,
            feature_cols=feature_cols,
            target_col=target_col,
            metadata_cols=metadata_cols,
            proba_col=proba_col,
        )

    @staticmethod
    def from_table(
        spark: SparkSession,
        name: str,
        target_col: Optional[str] = None,
        feature_cols: Optional[List[str]] = None,
        metadata_cols: Optional[List[str]] = None,
        proba_col: Optional[str] = None,
    ) -> SparkDataset:
        """Catalog table (Iceberg at scale) — the north-rule input path."""
        df = spark.read.table(name)
        return SparkDataset(
            df,
            feature_cols=feature_cols,
            target_col=target_col,
            metadata_cols=metadata_cols,
            proba_col=proba_col,
        )

    @staticmethod
    def from_json(
        spark: SparkSession,
        path: Union[str, Path],
        target_col: Optional[str] = None,
        feature_cols: Optional[List[str]] = None,
        metadata_cols: Optional[List[str]] = None,
        proba_col: Optional[str] = None,
        multiline: bool = False,
        **read_options,
    ) -> SparkDataset:
        """JSON-lines (or multiline=True for JSON arrays) source."""
        df = (
            spark.read.option("multiLine", multiline)
            .options(**read_options)
            .json(str(path))
        )
        logger.info("Loaded JSON %s: %d columns", path, len(df.columns))
        return SparkDataset(
            df,
            feature_cols=feature_cols,
            target_col=target_col,
            metadata_cols=metadata_cols,
            proba_col=proba_col,
        )

    @staticmethod
    def from_orc(
        spark: SparkSession,
        path: Union[str, Path],
        target_col: Optional[str] = None,
        feature_cols: Optional[List[str]] = None,
        metadata_cols: Optional[List[str]] = None,
        proba_col: Optional[str] = None,
        **read_options,
    ) -> SparkDataset:
        """ORC source (columnar, predicate-pushdown-capable like parquet)."""
        df = spark.read.options(**read_options).orc(str(path))
        logger.info("Loaded ORC %s: %d columns", path, len(df.columns))
        return SparkDataset(
            df,
            feature_cols=feature_cols,
            target_col=target_col,
            metadata_cols=metadata_cols,
            proba_col=proba_col,
        )
