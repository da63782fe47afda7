"""Hilbert key (continuity + bijection on the full grid, Spark-side)
and dag_levels vs a python longest-path reference."""

import random

from pyspark.sql import functions as F

from bdtopo2refhydro_spark.operators.graph import dag_levels


def _xy2d_ref(bits, x, y):
    d = 0
    for level in range(bits):
        s = 1 << (bits - 1 - level)
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * (3 * rx + ry - 2 * rx * ry)
        xm, ym = x & (s - 1), y & (s - 1)
        if ry == 0:
            x = (s - 1 - ym) if rx else ym
            y = (s - 1 - xm) if rx else xm
        else:
            x, y = xm, ym
    return d


def test_hilbert_spark_chain_full_grid(spark):
    from bdtopo2refhydro_spark.functions.cells import hilbert_steps

    bits, n = 5, 32
    pts = [(x, y) for x in range(n) for y in range(n)]
    cur = spark.createDataFrame(pts, "x long, y long").selectExpr(
        "x", "y", "x as hx", "y as hy", "cast(0 as long) as hd")
    for xe, ye, de in hilbert_steps(bits):
        cur = cur.selectExpr("x", "y", f"{xe} as hx", f"{ye} as hy",
                             f"{de} as hd")
    got = {(r["x"], r["y"]): r["hd"] for r in cur.collect()}
    # matches reference everywhere
    assert all(got[(x, y)] == _xy2d_ref(bits, x, y) for x, y in pts)
    # bijection onto 0..n^2-1 and unit-step continuity
    inv = {d: xy for xy, d in got.items()}
    assert sorted(inv) == list(range(n * n))
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = inv[d - 1], inv[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_dag_levels_vs_longest_path(spark):
    rng = random.Random(31)
    n = 80
    edges = []
    for u in range(n):
        for _ in range(2):
            v = rng.randrange(u + 1, n + 5)
            if v < n:
                edges.append((u, v))
    edges = sorted(set(edges))
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: r["level"] for r in dag_levels(df).collect()}
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    lv = {v: 0 for v in nodes}
    for u in sorted(nodes):  # u < v makes sorted order topological
        for (a, b) in edges:
            if a == u:
                lv[b] = max(lv[b], lv[a] + 1)
    assert got == lv


def test_dag_levels_disconnected_and_chain(spark):
    edges = [(0, 1), (1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: r["level"] for r in dag_levels(df).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 10: 0, 11: 1}
