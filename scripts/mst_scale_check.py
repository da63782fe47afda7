"""Natural-scale verification of boruvka_mst: the distributed MST on a
~2M-edge LCG multigraph must equal a sequential Kruskal union-find
reference EDGE-FOR-EDGE (distinct weights → unique forest).

The sf fixtures exercise Borůvka at 500-node scale where the hook loop
converges in 2-3 rounds; this is the scale where the component-graph
halving and the inner CC relabel actually do their log-round work.

Run: python scripts/mst_scale_check.py  (env: MST_N_NODES, MST_N_EDGES)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NODES = int(os.environ.get("MST_N_NODES", "1000000"))
N_EDGES = int(os.environ.get("MST_N_EDGES", "2000000"))


def main():
    # LCG edge list; weights i*1000 + (x % 997) are distinct
    i = np.arange(N_EDGES, dtype=np.int64)
    x = (i * 1103515245 + 12345) % 2147483648
    u = x % N_NODES
    v = (x // N_NODES) % N_NODES
    v = np.where(u == v, (v + 1) % N_NODES, v)
    w = i * 1000 + (x % 997)

    # sequential Kruskal reference (path-halving union-find)
    t0 = time.time()
    parent = np.arange(N_NODES, dtype=np.int64)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    order = np.argsort(w, kind="stable")
    want = set()
    for j in order:
        ru, rv = find(u[j]), find(v[j])
        if ru != rv:
            parent[ru] = rv
            want.add(int(j))
    t_ref = time.time() - t0
    print(f"kruskal reference: {len(want)} edges in {t_ref:.1f}s",
          flush=True)

    from bdtopo2refhydro_spark.session import get_spark
    from bdtopo2refhydro_spark.operators.graph import (
        TraversalMetrics, boruvka_mst)

    spark = get_spark("mst_scale", cores=8, shuffle_partitions=32)
    import pandas as pd

    pdf = pd.DataFrame({"eid": i, "u": u, "v": v, "w": w})
    df = spark.createDataFrame(pdf).repartition(32)
    m = TraversalMetrics()
    t0 = time.time()
    got = {r["eid"] for r in boruvka_mst(df, metrics=m).collect()}
    t_eng = time.time() - t0
    hook_rounds = len([r for r in m.rounds if r.get("op") == "boruvka_mst"])
    print(f"boruvka: {len(got)} edges in {t_eng:.1f}s, "
          f"{hook_rounds} hook rounds", flush=True)
    assert got == want, (
        f"MISMATCH: |got|={len(got)} |want|={len(want)} "
        f"|sym diff|={len(got ^ want)}")
    print(f"IDENTICAL at {N_EDGES} edges / {N_NODES} nodes "
          f"(engine {t_eng:.1f}s, reference {t_ref:.1f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
