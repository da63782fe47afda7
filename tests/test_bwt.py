"""bwt_encode roundtrip: invert the transform and recover the word."""

import random

from bdtopo2refhydro_spark.operators.text import bwt_encode


def _inverse_bwt(bwt, primary):
    # standard LF-mapping inversion
    table = sorted((c, i) for i, c in enumerate(bwt))
    nxt = [i for _, i in table]
    out = []
    r = primary
    for _ in range(len(bwt)):
        r = nxt[r]
        out.append(bwt[r])
    return "".join(out)


def test_bwt_roundtrip_random_words(spark):
    rng = random.Random(29)
    words = list({"".join(rng.choice("abc") for _ in range(rng.randrange(1, 10)))
                  for _ in range(80)})
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: (r["bwt"], r["primary"])
           for r in bwt_encode(df).collect()}
    for w in words:
        bwt, primary = got[w]
        assert sorted(bwt) == sorted(w + "|")
        recovered = _inverse_bwt(bwt, primary)
        assert recovered == w + "|", (w, bwt, primary, recovered)


def test_bwt_known_example(spark):
    df = spark.createDataFrame([("banana",)], "word string")
    r = bwt_encode(df).collect()[0]
    # rotations of 'banana|' sorted -> last column
    t = "banana|"
    rots = sorted(t[i:] + t[:i] for i in range(len(t)))
    assert r["bwt"] == "".join(x[-1] for x in rots)
    assert rots[r["primary"]] == t
