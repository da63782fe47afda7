"""Tarjan-Vishkin biconnected components vs a sequential DFS Tarjan
reference, and articulation points vs remove-vertex brute force."""
import random

import pytest

from bdtopo2refhydro_spark.operators.graph import (
    articulation_points, biconnected_components)


def _tarjan_blocks(nodes, edges):
    """Sequential edge-stack Tarjan. Returns set of frozensets of
    canonical edges, one per biconnected component."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    disc, low = {}, {}
    blocks, stack = [], []
    t = [0]

    def dfs(root):
        work = [(root, None, iter(adj[root]))]
        disc[root] = low[root] = t[0]
        t[0] += 1
        while work:
            u, parent, it = work[-1]
            adv = False
            for v in it:
                if v == parent:
                    parent = None  # skip parent edge once (multi-edge safe)
                    work[-1] = (u, parent, it)
                    continue
                if v not in disc:
                    stack.append((min(u, v), max(u, v)))
                    disc[v] = low[v] = t[0]
                    t[0] += 1
                    work.append((v, u, iter(adj[v])))
                    adv = True
                    break
                elif disc[v] < disc[u]:
                    stack.append((min(u, v), max(u, v)))
                    low[u] = min(low[u], disc[v])
            if adv:
                continue
            work.pop()
            if work:
                pu = work[-1][0]
                low[pu] = min(low[pu], low[u])
                if low[u] >= disc[pu]:
                    blk = set()
                    while stack:
                        e = stack.pop()
                        blk.add(e)
                        if e == (min(pu, u), max(pu, u)):
                            break
                    blocks.append(frozenset(blk))

    dfs(min(nodes))
    return set(blocks)


def _random_connected(rng, n, extra):
    edges = set()
    for v in range(1, n):
        p = rng.randrange(v)
        edges.add((min(p, v), max(p, v)))
    for _ in range(extra):
        a, b = rng.sample(range(n), 2)
        edges.add((min(a, b), max(a, b)))
    return sorted(edges)


@pytest.mark.parametrize("seed", [11, 29, 53])
def test_biconnected_blocks_match_sequential_tarjan(spark, seed):
    rng = random.Random(seed)
    n = 35
    edges = _random_connected(rng, n, 14)
    df = spark.createDataFrame(edges, "u long, v long")
    rows = biconnected_components(df).collect()
    by_block = {}
    for r in rows:
        by_block.setdefault(r["block"], set()).add((r["a"], r["b"]))
    got = {frozenset(s) for s in by_block.values()}
    want = _tarjan_blocks(range(n), edges)
    assert got == want
    # canonical labels: the block's minimal edge packed as a*2^32+b
    for blk, es in by_block.items():
        assert blk == min(a * (1 << 32) + b for a, b in es)


@pytest.mark.parametrize("seed", [7, 61])
def test_articulation_points_vs_bruteforce(spark, seed):
    rng = random.Random(seed)
    n = 30
    edges = _random_connected(rng, n, 10)
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: r["is_art"]
           for r in articulation_points(df).collect()}

    def n_comps(skip):
        seen, todo = set(), []
        nodes = [v for v in range(n) if v != skip]
        comps = 0
        adj = {}
        for a, b in edges:
            if a != skip and b != skip:
                adj.setdefault(a, []).append(b)
                adj.setdefault(b, []).append(a)
        for s in nodes:
            if s in seen:
                continue
            comps += 1
            todo = [s]
            seen.add(s)
            while todo:
                u = todo.pop()
                for v in adj.get(u, ()):
                    if v not in seen:
                        seen.add(v)
                        todo.append(v)
        return comps

    base = n_comps(None)
    for v in range(n):
        assert got[v] == (n_comps(v) > base), v
