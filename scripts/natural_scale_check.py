"""Natural-scale distributed-path oracle run (VERDICT r2 'Next round' #5).

Every sf* fixture sits below SMALL_GRAPH_ROWS = 2M adjacency rows, so the
traversal operators take their single-task local path under the normal
oracle run and the distributed paths are value-verified only when FORCED
(oracle_check --distributed). This script closes that gap by size instead
of by forcing:

 1. synthesizes a documents table big enough that the derived forest has
    >2M edges (default 2.2M docs -> ~2.07M edges after the h%17 drop) into
    $NATURAL_SCALE_DIR (default /tmp/sfbig), symlinking the other tables
    from sf0.01 so oracle_check's view registration finds them;
 2. prints the traversal mode each operator NATURALLY selects at that size
    (TraversalMetrics: expects mode=cc / mode=contract, not local);
 3. runs scripts/oracle_check.py on the graph entries against DuckDB —
    exact value verification with the distributed paths chosen by size.

Usage: python scripts/natural_scale_check.py [n_docs]
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]

# graph entries whose Spark side picks a physical strategy by size; all
# carry exact DuckDB oracles (strahler_binary covers the G7 machinery)
QUERIES = ["bfs_reach", "dist_from_root", "measure_outlet", "upstream_len",
           "hack_order", "strahler_binary"]


def build_fixture(n_docs: int, out_dir: str, src_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    dest = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(dest):
        duckdb.sql(
            f"""COPY (
              SELECT i AS doc_id, 't' || i AS text, 'en' AS lang,
                     's' || (i % 7) AS source,
                     CAST(length('t' || i) AS BIGINT) AS n_chars
              FROM range({n_docs}) t(i)
            ) TO '{dest}' (FORMAT PARQUET)"""
        )
    for t in TABLES:
        link = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(src_dir, f"{t}.parquet"), link)


def print_natural_modes(sf_dir: str) -> bool:
    """Run the traversal operators once with metrics attached and report
    the mode the size-based auto selection picked."""
    import __spark_entry__ as E
    from bdtopo2refhydro_spark.operators import (
        hack_order,
        select_connected,
        strahler_order,
        upstream_length,
    )
    from bdtopo2refhydro_spark.operators.graph import TraversalMetrics
    from bdtopo2refhydro_spark.session import get_spark

    spark = get_spark("natural_modes", cores=8, shuffle_partitions=16)
    e = E._forest_edges(spark, sf_dir).localCheckpoint()
    n = e.count()
    print(f"forest edges: {n} (threshold 2,000,000)")
    ok = n > 2_000_000
    outlets = spark.createDataFrame([(0,)], "node long")

    runs = []
    m = TraversalMetrics()
    select_connected(e, outlets, metrics=m).count()
    runs.append(("select_connected", m))
    m = TraversalMetrics()
    upstream_length(e, metrics=m).count()
    runs.append(("upstream_length", m))
    m = TraversalMetrics()
    hack_order(e, outlets, metrics=m).count()
    runs.append(("hack_order", m))
    m = TraversalMetrics()
    strahler_order(e, metrics=m).count()
    runs.append(("strahler_order", m))
    for name, m in runs:
        modes = sorted({r["mode"] for r in m.rounds if "mode" in r})
        print(f"{name:20s} natural mode(s): {modes}")
        if "local" in modes or not modes:
            ok = False
    spark.stop()
    return ok


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_200_000
    out_dir = os.environ.get("NATURAL_SCALE_DIR", "/tmp/sfbig")
    build_fixture(n_docs, out_dir, "/root/testdata/sf0.01")
    if not print_natural_modes(out_dir):
        print("FAIL: a traversal still selected the local path")
        return 1
    rc = subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "oracle_check.py"), out_dir] + QUERIES
    )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
