"""asof_join_forward vs a python merge_asof(direction='forward')
reference, ties and tolerance included."""

import random

from bdtopo2refhydro_spark.operators.temporal import asof_join_forward


def test_asof_forward_matches_reference(spark):
    rng = random.Random(47)
    left = [(i, rng.randrange(0, 4), rng.randrange(0, 200))
            for i in range(150)]
    right_raw = {(rng.randrange(0, 4), rng.randrange(0, 200))
                 for _ in range(80)}
    right = [(k, t, k * 1000 + t) for k, t in right_raw]
    ldf = spark.createDataFrame(left, "lid long, k long, t long")
    rdf = spark.createDataFrame(right, "k long, t long, v long")
    got = {r["lid"]: r["nxt"]
           for r in asof_join_forward(ldf, rdf, "k", "t", "v",
                                      tolerance=50,
                                      out_col="nxt").collect()}
    for lid, k, t in left:
        cands = [(rt, v) for rk, rt, v in right
                 if rk == k and rt >= t and rt - t <= 50]
        expected = min(cands)[1] if cands else -1
        assert got[lid] == expected, (lid, k, t)


def test_asof_forward_tie_matches_same_ts(spark):
    ldf = spark.createDataFrame([(1, 0, 10)], "lid long, k long, t long")
    rdf = spark.createDataFrame([(0, 10, 7), (0, 11, 9)],
                                "k long, t long, v long")
    r = asof_join_forward(ldf, rdf, "k", "t", "v").collect()[0]
    assert r["v"] == 7  # inclusive at equal ts
