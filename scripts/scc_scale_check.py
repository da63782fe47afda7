"""Natural-scale verification of strongly_connected_components: the
distributed coloring SCC on a ~460k-edge LCG digraph must equal an
ITERATIVE Tarjan reference node-for-node (scc_id = min member).

The sf fixtures exercise SCC at 500-node scale; this is the scale where
trim actually peels in bulk and the forward-color fixpoint runs its
diameter-bound rounds.

Run: python scripts/scc_scale_check.py  (env: SCC_N_NODES)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("SCC_N_NODES", "200000"))


def build_edges(n):
    """Block-structured digraph: functional (rho) edges stay INSIDE
    1000-node blocks (cycles confined per block → thousands of SCCs),
    u → u//2 edges glue blocks into a DAG (strictly downward, no
    cross-block cycles) — so trim, coloring, and the backward flag all
    do real work instead of collapsing into one giant SCC."""
    edges = set()
    for d in range(n):
        base = d - (d % 1000)
        v = base + ((d * 7 + 3) % 1000)
        if v != d and v < n:
            edges.add((d, v))
        if d % 3 == 0 and d >= 1:
            edges.add((d, d // 2))
        if d % 17 == 0 and d >= 1 and (d // 2) >= base:
            edges.add((d // 2, d))
    return sorted(edges)


def tarjan_iterative(n, edges):
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
    index = [-1] * n
    low = [0] * n
    onstk = [False] * n
    stack = []
    comp = [0] * n
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                onstk[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif onstk[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    onstk[w] = False
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return comp


def main():
    edges = build_edges(N)
    print(f"{len(edges)} edges over {N} nodes", flush=True)
    t0 = time.time()
    comp = tarjan_iterative(N, edges)
    t_ref = time.time() - t0
    n_scc = len(set(comp))
    print(f"tarjan reference: {n_scc} SCCs in {t_ref:.1f}s", flush=True)

    from bdtopo2refhydro_spark.session import get_spark
    from bdtopo2refhydro_spark.operators.graph import (
        TraversalMetrics, strongly_connected_components)

    spark = get_spark("scc_scale", cores=8, shuffle_partitions=32)
    import pandas as pd

    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    df = spark.createDataFrame(pdf).repartition(32)
    m = TraversalMetrics()
    t0 = time.time()
    got = {r["node"]: r["scc_id"]
           for r in strongly_connected_components(
               df, metrics=m).collect()}
    t_eng = time.time() - t0
    outers = max((r.get("outer", 0) for r in m.rounds), default=0) + 1
    print(f"engine: {len(got)} nodes in {t_eng:.1f}s, "
          f"{outers} outer rounds", flush=True)
    bad = [v for v in got if got[v] != comp[v]]
    assert not bad, f"MISMATCH on {len(bad)} nodes, e.g. {bad[:5]}"
    assert len(got) == N
    print(f"IDENTICAL at {N} nodes / {len(edges)} edges "
          f"({n_scc} SCCs; engine {t_eng:.1f}s, reference {t_ref:.1f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
