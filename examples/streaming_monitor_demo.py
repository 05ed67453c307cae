"""Streaming drift monitoring end-to-end demo.

Lands three parquet micro-batches (stable, mildly drifted, heavily
drifted) into an incoming directory, then runs StreamingDriftMonitor over
them as a real Structured Streaming query: per-batch PSI + KS + chi2
verdicts are scored against the once-fitted reference state and appended
to a parquet sink, which the demo reads back and prints.

Run:  python examples/streaming_monitor_demo.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from driftspark.session import get_spark  # noqa: E402
from driftspark.streaming import StreamingDriftMonitor  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="streaming-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="driftspark_stream_demo_")
    try:
        rng = np.random.RandomState(42)
        ref = pd.DataFrame({
            "width": rng.normal(64, 8, 5000),
            "brightness": rng.normal(0.5, 0.1, 5000),
            "fmt": rng.choice(["png", "jpeg"], 5000, p=[0.7, 0.3]),
        })
        monitor = StreamingDriftMonitor(
            spark.createDataFrame(ref),
            numeric_cols=["width", "brightness"],
            cat_cols=["fmt"],
            # 1% level: at the default 5%, one stable batch in twenty
            # trips chi2 by chance — expected behavior, noisy in a demo
            chi2_threshold=0.01,
        )

        batches = [
            ("stable", 0.0, 0.0, [0.7, 0.3]),
            ("mild drift", 4.0, 0.02, [0.6, 0.4]),
            ("heavy drift", 20.0, 0.15, [0.2, 0.8]),
        ]
        for i, (_, dw, db, pf) in enumerate(batches):
            pdf = pd.DataFrame({
                "width": rng.normal(64 + dw, 8, 3000),
                "brightness": rng.normal(0.5 + db, 0.1, 3000),
                "fmt": rng.choice(["png", "jpeg"], 3000, p=pf),
            })
            spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{tmp}/in/b{i}")

        stream = (
            spark.readStream.schema("width double, brightness double, fmt string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        q = monitor.start(stream, f"{tmp}/sink", f"{tmp}/ckpt")
        assert q.awaitTermination(180), "stream timed out"

        out = (
            spark.read.parquet(f"{tmp}/sink")
            .orderBy("batch_id", "feature", "check")
            .toPandas()
        )
        print(out.to_string(index=False))
        n_failed = int((~out["passed"]).sum())
        print(f"\n{len(out)} verdicts across {out['batch_id'].nunique()} "
              f"micro-batches; {n_failed} failed")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
