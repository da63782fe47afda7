"""Stage checkpoint / resume (north rule): every pipeline stage materializes
to a table; a rerun skips stages whose output already exists — the engine's
analog of the reference's per-script GPKG materialization
(create_reference_hydro_workflow.py:119-150), but resumable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .lineage import Lineage


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str,
                 lineage: Lineage | None = None, resume: bool = True) -> None:
        self.spark = spark
        self.root = root
        self.lineage = lineage or Lineage()
        self.resume = resume

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def stage(self, name: str, fn) -> DataFrame:
        """Run fn() → DataFrame, persist to parquet under the stage name, and
        return the materialized re-read (truncates lineage like the
        reference's per-script GPKG writes). If the stage output already
        exists and resume=True, skip the compute entirely."""
        path = self._path(name)
        if self.resume and self.done(name):
            self.lineage.add(name, "resumed", 1.0)
            return self.spark.read.parquet(path)
        with self.lineage.stage(name):
            df = fn()
            df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        self.lineage.rows(name, out)
        return out
