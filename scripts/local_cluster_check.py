"""Validate the engine under local-cluster[N,C,M] — REAL multi-JVM
executors with wire serialization, broadcast exchange, and python
workers spawned by the worker JVMs (everything local[32] hides) —
VERDICT r4 'Next round' #6.

Runs a set of flagship queries (spatial composite, graph fixpoints,
LSH dedup, curation composite — pandas UDFs, broadcasts, localCheckpoint
loops all exercised) at sf0.001 in BOTH modes and compares exact sorted
results. The package reaches executors the same way a real cluster gets
it: the spark-submit --py-files zip (scripts/package_pyfiles.py) via
spark.submit.pyFiles.

Each mode runs in its OWN subprocess (fresh JVM): py-files distribution
to executor python workers only wires up for the FIRST SparkContext a
python process creates — a second in-process context silently loses it
(ModuleNotFoundError in the pandas-UDF worker; found by this check).

Usage: python scripts/local_cluster_check.py [sf_dir] [query...]
Exit 0 iff every query's local-cluster result equals its local result.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = [
    "reference_network",   # full §2 composite: G1+J1+G2+G4+A3, pandas UDFs
    "zonal_pct",           # J9 cell-bucketed broadcast + in-cell clip
    "bfs_reach",           # O(log) CC traversal (checkpointed self-joins)
    "strahler_order",      # contracted junction-graph fixpoint
    "lsh_pairs",           # banded MinHash self-join
    "curation_pipeline",   # 5-stage curation composite
    "ivf_multi_ann",       # broadcast centroids + window ranking
]


def _worker(master: str, sf_dir: str, out_path: str,
            queries: list[str], pyfile: str | None) -> None:
    from pyspark.sql import SparkSession

    b = (SparkSession.builder.master(master)
         .appName(f"lcheck-{master.split('[')[0]}")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.local.dir", "/dev/shm/spark-local")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false"))
    if pyfile:
        b = b.config("spark.submit.pyFiles", pyfile)
    spark = b.getOrCreate()
    import __spark_entry__ as E
    out = {}
    try:
        for name in queries:
            df = E.queries()[name](spark, sf_dir)
            cols = sorted(df.columns)
            rows = df.select(*cols).collect()
            out[name] = sorted([repr(v) for v in r] for r in rows)
            print(f"  {master}: {name} -> {len(out[name])} rows",
                  flush=True)
    finally:
        spark.stop()
    with open(out_path, "w") as f:
        json.dump(out, f)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        master, sf_dir, out_path = sys.argv[2:5]
        queries = sys.argv[5:-1] if sys.argv[-1] in ("-", "") \
            else sys.argv[5:]
        pyfile = None
        if master.startswith("local-cluster"):
            from scripts.package_pyfiles import build
            pyfile = build()
        _worker(master, sf_dir, out_path, queries, pyfile)
        return 0

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    queries = sys.argv[2:] or QUERIES

    results = {}
    for master in ("local[8]", "local-cluster[2,4,2048]"):
        print(f"== {master} run (fresh JVM) ==", flush=True)
        with tempfile.NamedTemporaryFile(suffix=".json",
                                         delete=False) as tf:
            out_path = tf.name
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             master, sf_dir, out_path, *queries],
            cwd=ROOT, check=True)
        with open(out_path) as f:
            results[master] = json.load(f)
        os.unlink(out_path)

    ref = results["local[8]"]
    lc = results["local-cluster[2,4,2048]"]
    fails = []
    for name in queries:
        if ref[name] != lc[name]:
            fails.append(name)
            print(f"MISMATCH {name}: local {len(ref[name])} rows vs "
                  f"local-cluster {len(lc[name])} rows")
        else:
            print(f"{name:24s} OK  ({len(ref[name])} rows identical)")
    print("PASS" if not fails else f"FAIL: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
