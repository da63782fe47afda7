"""shortest_path_counts vs a python BFS + path-counting reference."""

import random
from collections import deque

from bdtopo2refhydro_spark.operators.graph import shortest_path_counts


def _ref(edges, src):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist, cnt = {src: 0}, {src: 1}
    q = deque([src])
    while q:
        u = q.popleft()
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                cnt[w] = 0
                q.append(w)
            if dist[w] == dist[u] + 1:
                cnt[w] += cnt[u]
    return {n: (dist[n], cnt[n]) for n in dist}


def test_sp_counts_random_graph(spark):
    rng = random.Random(53)
    edges = sorted({(rng.randrange(0, 40), rng.randrange(0, 40))
                    for _ in range(90)} - {(i, i) for i in range(40)})
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: (r["dist"], r["n_paths"])
           for r in shortest_path_counts(df, source=0).collect()}
    assert got == _ref(edges, 0)
    # multi-path evidence: some node has >1 shortest path
    assert any(c > 1 for _, c in got.values())


def test_sp_counts_diamond_golden(spark):
    # 0-1, 0-2, 1-3, 2-3: two shortest paths to 3
    df = spark.createDataFrame([(0, 1), (0, 2), (1, 3), (2, 3)],
                               "u long, v long")
    got = {r["node"]: (r["dist"], r["n_paths"])
           for r in shortest_path_counts(df, source=0).collect()}
    assert got == {0: (0, 1), 1: (1, 1), 2: (1, 1), 3: (2, 2)}
