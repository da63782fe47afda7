"""Natural-scale check for graph.euler_tour (list ranking): a
1,000,000-node random tree, tour positions compared EDGE-FOR-EDGE with
an iterative sorted-adjacency DFS reference (the same independent
semantics as tests/test_euler_tour.py, at the scale where the
pointer-doubling rounds — ~21 of them — actually matter).

Run: python scripts/euler_scale_check.py [n_nodes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def ref_tour(parents):
    adj = {}
    for v, p in parents:
        adj.setdefault(v, []).append(p)
        adj.setdefault(p, []).append(v)
    for k in adj:
        adj[k].sort()
    pos = {}
    # iterative DFS from 0, children in sorted order
    stack = [(0, None, 0)]  # (node, parent, next-neighbor index)
    t = 0
    while stack:
        u, par, idx = stack.pop()
        ns = adj[u]
        while idx < len(ns) and ns[idx] == par:
            idx += 1
        if idx >= len(ns):
            if par is not None:
                pos[(u, par)] = t
                t += 1
            continue
        w = ns[idx]
        stack.append((u, par, idx + 1))
        pos[(u, w)] = t
        t += 1
        stack.append((w, u, 0))
    return pos


def main():
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.operators.graph import euler_tour
    from bdtopo2refhydro_spark.session import get_spark

    spark = get_spark("euler_scale", cores=8, shuffle_partitions=64)
    # deterministic random tree: parent(v) = lcg(v) % v — uniform-ish
    # parents, depth O(log n) in expectation
    edges = spark.range(1, N).selectExpr(
        "id as u",
        "cast(((id * 1103515245 + 12345) % 2147483648) % id as long)"
        " as v")
    t0 = time.time()
    tour = euler_tour(edges, root=0)
    got = {(r["u"], r["v"]): r["pos"] for r in tour.collect()}
    wall = time.time() - t0
    print(f"engine: {len(got)} directed edges in {wall:.1f}s")

    parents = [(v, ((v * 1103515245 + 12345) % 2147483648) % v)
               for v in range(1, N)]
    t0 = time.time()
    want = ref_tour(parents)
    print(f"reference DFS: {time.time() - t0:.1f}s")
    assert len(got) == len(want) == 2 * (N - 1)
    assert got == want
    print(f"OK: euler_tour == iterative DFS on {N:,} nodes "
          f"({2 * (N - 1):,} directed edges)")
    spark.stop()


if __name__ == "__main__":
    main()
