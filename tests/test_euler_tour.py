"""euler_tour (list ranking) vs a recursive sorted-adjacency DFS
reference, plus structural tour properties."""

import random
import sys

from bdtopo2refhydro_spark.operators.graph import euler_tour


def _dfs_tour(edges, root):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    for k in adj:
        adj[k].sort()
    tour = []

    def go(u, parent):
        for w in adj[u]:
            if w == parent:
                continue
            tour.append((u, w))
            go(w, u)
            tour.append((w, u))

    sys.setrecursionlimit(10000)
    go(root, None)
    return {e: i for i, e in enumerate(tour)}


def test_euler_tour_random_tree(spark):
    rng = random.Random(59)
    edges = [(v, rng.randrange(0, v)) for v in range(1, 120)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {(r["u"], r["v"]): r["pos"]
           for r in euler_tour(df, root=0).collect()}
    assert got == _dfs_tour(edges, 0)


def test_euler_tour_properties(spark):
    edges = [(v, (v - 1) // 2) for v in range(1, 32)]  # complete binary
    df = spark.createDataFrame(edges, "u long, v long")
    rows = euler_tour(df, root=0).collect()
    n_edges = len(edges)
    assert len(rows) == 2 * n_edges
    by_pos = {r["pos"]: (r["u"], r["v"]) for r in rows}
    assert sorted(by_pos) == list(range(2 * n_edges))
    assert by_pos[0][0] == 0  # starts at the root
    # consecutive edges chain head-to-tail and the circuit closes
    for i in range(2 * n_edges):
        assert by_pos[i][1] == by_pos[(i + 1) % (2 * n_edges)][0]
    # each undirected edge appears once per direction
    undirected = {}
    for u, v in by_pos.values():
        undirected[frozenset((u, v))] = undirected.get(
            frozenset((u, v)), 0) + 1
    assert all(c == 2 for c in undirected.values())
