"""unigram_segment vs brute-force segmentation enumeration;
weighted_median vs a python reference."""

import random

from bdtopo2refhydro_spark.operators.corpus import weighted_median
from bdtopo2refhydro_spark.operators.text import unigram_segment

VOCAB = {"a": 2, "b": 2, "c": 2, "aa": 5, "ab": 5, "ba": 5, "ca": 5,
         "aba": 9, "bab": 9, "abc": 9, "abab": 13}


def _all_segmentations(w, vocab):
    if not w:
        yield 0
        return
    for ln in range(1, len(w) + 1):
        if w[:ln] in vocab:
            for rest in _all_segmentations(w[ln:], vocab):
                yield vocab[w[:ln]] + rest


def test_unigram_segment_vs_enumeration(spark):
    rng = random.Random(21)
    words = list({"".join(rng.choice("abc") for _ in range(rng.randrange(1, 9)))
                  for _ in range(60)})
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: (r["best_score"], r["n_best"])
           for r in unigram_segment(df, VOCAB).collect()}
    for w in words:
        scores = list(_all_segmentations(w, VOCAB))
        best = max(scores)
        assert got[w] == (best, scores.count(best)), w


def test_unigram_segment_unsegmentable(spark):
    df = spark.createDataFrame([("azb",)], "word string")
    r = unigram_segment(df, VOCAB).collect()[0]
    assert r["best_score"] is None and r["n_best"] == 0


def test_weighted_median_reference(spark):
    rng = random.Random(8)
    rows = [(g, rng.randrange(0, 40), rng.randrange(1, 10))
            for g in range(4) for _ in range(200)]
    df = spark.createDataFrame(rows, "g long, v long, wgt long")
    got = {r["g"]: (r["wmedian"], r["total_w"])
           for r in weighted_median(df, "v", "wgt").collect()}
    for g in range(4):
        pts = sorted((v, w) for gg, v, w in rows if gg == g)
        tot = sum(w for _, w in pts)
        cum = 0
        for v, w in pts:
            cum += w
            if 2 * cum >= tot:
                assert got[g] == (v, tot)
                break
