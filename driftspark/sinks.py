"""Result sinks — JSON summaries + distributed table outputs.

Reference parity (SURVEY.md §2.1 S4): the reference serializes
``PipelineResult.to_dict()`` to JSON
(examples/quickstart/folktables_demo.py:203-205).  The Spark engine keeps
that JSON surface for driver-scale summaries and ADDS distributed sinks
for the outputs that don't fit on a driver at 10^12 rows: verdict rows,
violation rows, per-row hallucination scores, and profile metrics all
write as parquet (or an Iceberg table when a catalog is configured).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame


def write_results_json(results: Dict[str, Any], path: str | Path) -> None:
    """Serialize {key: PipelineResult|dict} exactly like the reference demo
    (to_dict() then json.dump, indent=2)."""
    payload = {
        k: (v.to_dict() if hasattr(v, "to_dict") else v) for k, v in results.items()
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)


def read_results_json(path: str | Path) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "append",
    partition_by: Optional[list] = None,
    fmt: str = "parquet",
) -> None:
    """Write a verdict/violation/metrics DataFrame.

    ``target`` is a path for parquet or a table identifier for
    ``fmt='iceberg'`` (requires an Iceberg catalog on the session — at
    10^12 scale snapshots give the checkpoint/time-travel lineage;
    driftspark.checkpoint works against either backing).
    """
    if fmt == "iceberg":
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
