"""Per-stage / per-partition lineage metrics (north rule: "each stage emits
per-partition lineage + row-count metrics to enable resume-from-checkpoint").

The reference's only diagnostics are print() calls (duplicate count at
create_connected_reference_hydro.py:155). The engine records a structured
metrics table instead.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Lineage:
    def __init__(self) -> None:
        self.records: list[dict] = []

    def stage(self, name: str):
        """Context manager timing one stage."""
        lineage = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.monotonic()
                return self

            def __exit__(self, *exc):
                lineage.records.append(
                    {"stage": name, "metric": "wall_ms",
                     "value": (time.monotonic() - self.t0) * 1000.0}
                )

        return _Ctx()

    def rows(self, stage: str, df: DataFrame, label: str = "rows_out") -> int:
        n = df.count()
        self.records.append({"stage": stage, "metric": label, "value": float(n)})
        return n

    def partition_counts(self, stage: str, df: DataFrame) -> list[tuple[int, int]]:
        """Per-partition row counts — makes skew visible (SURVEY.md §7)."""
        counts = (
            df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").count().collect()
        )
        for r in counts:
            self.records.append(
                {"stage": stage, "metric": f"partition_{r._pid}_rows",
                 "value": float(r["count"])}
            )
        return [(r._pid, r["count"]) for r in counts]

    def add(self, stage: str, metric: str, value: float) -> None:
        self.records.append({"stage": stage, "metric": metric, "value": value})

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(r["stage"], r["metric"], float(r["value"])) for r in self.records],
            "stage string, metric string, value double",
        )

    def write(self, spark: SparkSession, path: str) -> None:
        self.to_df(spark).write.mode("overwrite").parquet(path)
