"""bipartite_check vs BFS 2-coloring; two_sat vs brute-force."""

import random
from collections import deque
from itertools import product

from bdtopo2refhydro_spark.operators.graph import bipartite_check, two_sat


def _two_color(adj, start):
    color = {start: 0}
    q = deque([start])
    ok = True
    while q:
        v = q.popleft()
        for w in adj.get(v, []):
            if w not in color:
                color[w] = 1 - color[v]
                q.append(w)
            elif color[w] == color[v]:
                ok = False
    return set(color), ok


def test_bipartite_random_vs_bfs(spark):
    rng = random.Random(19)
    edges = set()
    for _ in range(120):
        u, v = rng.randrange(0, 60), rng.randrange(0, 60)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    edges = sorted(edges)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    expected = {}
    seen = set()
    for s in sorted(adj):
        if s in seen:
            continue
        comp, ok = _two_color(adj, s)
        seen |= comp
        expected[min(comp)] = (len(comp), ok)
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["l"]: (r["n_nodes"], r["is_bipartite"])
           for r in bipartite_check(df).collect()}
    assert got == expected


def _brute_sat(clauses, nvars):
    for bits in product([0, 1], repeat=nvars):
        if all((bits[a] != sa) or (bits[b] != sb)
               for a, sa, b, sb in clauses):
            return True
    return False


def test_two_sat_vs_brute(spark):
    rng = random.Random(23)
    rows = []
    expected = {}
    for inst in range(6):
        n_cl = 14 + inst * 2
        cls = [(rng.randrange(0, 6), rng.randrange(0, 2),
                rng.randrange(0, 6), rng.randrange(0, 2))
               for _ in range(n_cl)]
        expected[inst] = _brute_sat(cls, 6)
        rows += [(inst, a, sa, b, sb) for a, sa, b, sb in cls]
    # planted contradiction
    rows += [(6, 0, 0, 0, 0), (6, 0, 1, 0, 1)]
    expected[6] = False
    df = spark.createDataFrame(
        rows, "inst long, v1 long, s1 long, v2 long, s2 long")
    got = {r["inst"]: r["satisfiable"] for r in two_sat(df).collect()}
    assert got == expected
    assert False in got.values() and True in got.values()
