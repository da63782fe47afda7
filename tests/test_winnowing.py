"""winnow_fingerprints: MOSS guarantees + rightmost tie-break."""

import random

from bdtopo2refhydro_spark.operators.text import winnow_fingerprints


def _ref_winnow(hs, w):
    out = set()
    for i in range(w - 1, len(hs)):
        window = hs[i - w + 1:i + 1]
        m = min(window)
        # rightmost minimal position
        for j in range(i, i - w, -1):
            if hs[j] == m:
                out.add((j, hs[j]))
                break
    return out


def test_winnowing_matches_reference_and_guarantee(spark):
    rng = random.Random(43)
    hs = [rng.randrange(1, 50) for _ in range(200)]  # many ties
    df = spark.createDataFrame(
        [(1, i, h) for i, h in enumerate(hs)],
        "doc_id long, pos long, h long")
    got = {(r["pos"], r["h"]) for r in
           winnow_fingerprints(df, window=4).collect()}
    assert got == _ref_winnow(hs, 4)
    # MOSS guarantee: every window of 4 contains a selected position
    sel = {p for p, _ in got}
    for i in range(3, len(hs)):
        assert any(j in sel for j in range(i - 3, i + 1))


def test_winnowing_rightmost_tie(spark):
    # all-equal hashes: the rightmost of each window is selected ->
    # every position from w-1 on
    df = spark.createDataFrame([(1, i, 7) for i in range(8)],
                               "doc_id long, pos long, h long")
    got = sorted(r["pos"] for r in
                 winnow_fingerprints(df, window=4).collect())
    assert got == [3, 4, 5, 6, 7]
