"""SparkDataset — the engine's single data abstraction.

Reproduces the reference ``Dataset`` contract
(/root/reference/src/drift_autopsy/core/dataset.py:9-103): a feature table
plus named side-channels (target, prediction, prediction probabilities,
metadata) — but lazily, as column roles over one pyspark DataFrame instead
of materialized numpy arrays.  Type dispatch (numeric vs categorical,
reference ks_test.py:77 / psi.py:169) is schema-driven here instead of
pandas-dtype-driven.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, NumericType, StringType


class SparkDataset:
    """A DataFrame plus column-role annotations.

    Args:
        df: the underlying DataFrame (one table carries features + labels).
        feature_cols: feature columns; default = every column not claimed
            by another role (mirrors Dataset.from_pandas slicing,
            reference dataset.py:37-103).
        target_col / prediction_col / proba_col: label, model prediction,
            and probability columns (proba may be double or array<double>).
        metadata_cols: non-feature passthrough columns (e.g. group, part,
            image_id).
    """

    def __init__(
        self,
        df: DataFrame,
        feature_cols: Optional[Sequence[str]] = None,
        target_col: Optional[str] = None,
        prediction_col: Optional[str] = None,
        proba_col: Optional[str] = None,
        metadata_cols: Optional[Sequence[str]] = None,
    ):
        self.df = df
        self.target_col = target_col
        self.prediction_col = prediction_col
        self.proba_col = proba_col
        self.metadata_cols = list(metadata_cols or [])
        claimed = set(self.metadata_cols)
        for c in (target_col, prediction_col, proba_col):
            if c:
                claimed.add(c)
        if feature_cols is None:
            feature_cols = [c for c in df.columns if c not in claimed]
        missing = [c for c in feature_cols if c not in df.columns]
        if missing:
            raise ValueError(f"feature columns not in DataFrame: {missing}")
        self.feature_cols: List[str] = list(feature_cols)
        self._n_samples: Optional[int] = None

    # -- schema-driven type dispatch ------------------------------------
    @property
    def numeric_features(self) -> List[str]:
        fields = {f.name: f.dataType for f in self.df.schema.fields}
        return [c for c in self.feature_cols if isinstance(fields[c], NumericType)]

    @property
    def categorical_features(self) -> List[str]:
        fields = {f.name: f.dataType for f in self.df.schema.fields}
        return [c for c in self.feature_cols if isinstance(fields[c], StringType)]

    # -- reference-API accessors ----------------------------------------
    @property
    def feature_names(self) -> List[str]:
        return list(self.feature_cols)

    @property
    def n_features(self) -> int:
        return len(self.feature_cols)

    @property
    def n_samples(self) -> int:
        """Row count; computed once and cached (an action, unlike the
        reference's free len())."""
        if self._n_samples is None:
            self._n_samples = self.df.count()
        return self._n_samples

    @property
    def shape(self) -> tuple:
        return (self.n_samples, self.n_features)

    def features_df(self) -> DataFrame:
        return self.df.select(*self.feature_cols)

    def get_feature(self, name: str) -> DataFrame:
        if name not in self.feature_cols:
            raise KeyError(f"Feature '{name}' not found")
        return self.df.select(name)

    def proba_is_array(self) -> bool:
        if not self.proba_col:
            return False
        dt = dict((f.name, f.dataType) for f in self.df.schema.fields)[self.proba_col]
        return isinstance(dt, ArrayType)

    @classmethod
    def from_pandas(
        cls,
        spark,
        pdf,
        target_col: Optional[str] = None,
        prediction_col: Optional[str] = None,
        proba_col: Optional[str] = None,
        metadata_cols: Optional[Sequence[str]] = None,
    ) -> "SparkDataset":
        """Convenience mirror of reference Dataset.from_pandas for tests."""
        return cls(
            spark.createDataFrame(pdf),
            target_col=target_col,
            prediction_col=prediction_col,
            proba_col=proba_col,
            metadata_cols=metadata_cols,
        )
