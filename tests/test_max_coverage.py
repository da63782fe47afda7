"""greedy_max_coverage vs a sequential python greedy reference."""

import random

from bdtopo2refhydro_spark.operators.corpus import greedy_max_coverage


def test_greedy_max_coverage_matches_reference(spark):
    rng = random.Random(37)
    sets = {sid: {rng.randrange(0, 30) for _ in range(5)}
            for sid in range(25)}
    rows = [(sid, it) for sid, items in sets.items() for it in items]
    df = spark.createDataFrame(rows, "sid long, item long")
    got = [(r["round"], r["sid"], r["gain"])
           for r in sorted(greedy_max_coverage(df, 6).collect(),
                           key=lambda r: r["round"])]
    covered = set()
    expected = []
    for rnd in range(6):
        best = max(((len(s - covered), -sid) for sid, s in sets.items()),
                   default=None)
        gain, nsid = best
        if gain == 0:
            break
        expected.append((rnd, -nsid, gain))
        covered |= sets[-nsid]
    assert got == expected
    assert got[0][2] >= got[-1][2]  # diminishing returns held


def test_greedy_max_coverage_stops_when_exhausted(spark):
    df = spark.createDataFrame([(0, 1), (0, 2), (1, 1)],
                               "sid long, item long")
    got = [(r["round"], r["sid"], r["gain"])
           for r in greedy_max_coverage(df, 5).collect()]
    assert got == [(0, 0, 2)]  # set 1 has zero marginal gain -> stop
