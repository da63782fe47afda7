"""Natural-scale skew demonstration for the TEXT family (VERDICT r3 #9).

The spatial family has scripts/knn_scale_check.py (2M skewed points ==
numpy); the text family's skew story had only an sf0.1 runtime pin. This
script builds a 2.4M-document corpus with PLANTED boilerplate — the real
web-skew shape: one template page (cookie banner / nav chrome) appears on
10% of a crawl, so its MinHash band keys own hot LSH buckets — and
demonstrates, at that scale:

1. **AQE splits the hot band bucket at the production-default
   skewedPartitionFactor=5** in the asymmetric new×old banded join
   (`skew=true` in the FINAL adaptive plan of the same lsh_bands-join
   shape `incremental_dedup` runs).
2. **Values stay exact**: the full `incremental_dedup` of a 60k-doc new
   snapshot against the 2.4M-doc old corpus reproduces the planted
   closed form — every planted exact copy flagged dropped_exact, every
   planted near-boilerplate doc flagged dropped_near, everything else
   kept. Counts are asserted, not eyeballed.

Fixture-realism notes, learned the hard way (each iterated empirically):

- **AQE's skew decision reads COMPRESSED map-output bytes, and the
  compression asymmetry works AGAINST the hot bucket**: its rows repeat
  one band_key, which lz4 compresses away (~12B/row effective), while
  median partitions hold distinct md5 band keys (~45B/row incompressible)
  — a 7× ROW skew shrinks to <2× BYTE skew and factor=5 never fires
  (factor=1 does — the mechanism works, the fixture lied). Honest at
  factor=5 needs rows_hot ≳ 19× rows_median: at 2.4M docs / 10% boiler /
  1024 partitions the hot bucket is 240k rows (~2.9MB) vs a ~9.4k-row
  (~420KB) median — ratio ≈ 7 > 5. A 60k-row hot bucket (the first
  fixture) is only ~1.7× in bytes and silently under the bar.
- doc_id is additionally a bijective high-entropy scramble (Knuth-hash
  high 32 bits, identity low 22) so the id payload itself doesn't
  deflate the hot bucket further the way sequential ids do.
- **Byte thresholds are scaled to the row width**: band rows ship ids +
  band key, never text, so the 256MB default threshold regime is three
  orders away. The skewedPartitionFactor — the skew *ratio* bar — stays
  at the production default 5.
- The new-side boiler rate is kept small (~45 docs) so the candidate
  pair volume (new_boiler × old_boiler ≈ 11M) exercises the hot bucket
  without turning the check into an all-pairs stress test.

Usage: python scripts/text_scale_check.py [n_old] [n_new]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_OLD = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
N_NEW = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
# doc_id scrambling keeps the low 22 bits as the raw index (bijectivity)
assert N_OLD + N_NEW < (1 << 22), "id scramble needs ix < 2^22"

_VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
          "omega red green blue cyan magenta yellow").split()

# every BOILER_EVERY-th old doc carries the template text (10% of the
# crawl on one signature — the hot buckets); planted new-side rates below
BOILER_EVERY = 10
NEW_EXACT_EVERY = 10    # new doc copies an old doc byte-for-byte
NEW_BOILER_EVERY = 1201  # new doc is a 1-token variant of the template

BOILER = " ".join(_VOCAB) + " accept cookies to continue browsing"


def _scramble(col: str) -> str:
    """Bijective high-entropy doc id: Knuth multiplicative hash in the
    high 32 bits, raw index in the low 22 (collision-free for ix < 2^22,
    no int64 overflow under ANSI for ix < 2^32)."""
    return (f"(shiftleft(pmod({col} * 2654435761, 4294967296), 22) "
            f"+ {col})")


def _corpus(spark, n: int, planted: bool) -> "DataFrame":  # noqa: F821
    """Deterministic corpus. planted=True (old corpus): every
    BOILER_EVERY-th doc is the byte-identical template. planted=False
    (new snapshot): every NEW_EXACT_EVERY-th doc duplicates old doc
    (ix*7) byte-for-byte, every NEW_BOILER_EVERY-th (when not exact)
    is the template with ONE token changed — misses the digest, shares
    bands, passes the Jaccard≥0.5 verify. Text derives from the RAW
    index ix; only the doc_id column is scrambled."""
    vocab = ", ".join(f"'{w}'" for w in _VOCAB)

    def unique_text(col: str) -> str:
        # the doc marker u<col> is WOVEN IN at every 3rd position so
        # every k=3 token shingle contains it — cross-doc Jaccard is
        # exactly 0 between different unique docs (a trailing-marker-only
        # construction leaves docs with col ≡ col' (mod 150) sharing
        # their whole patterned token stream → spurious near-dup flags)
        return (f"concat_ws(' ', transform(sequence(1, 21 + {col} % 24), "
                f"i -> CASE WHEN i % 3 = 0 THEN "
                f"concat('u', cast({col} as string)) "
                f"ELSE element_at(array({vocab}), "
                f"cast((({col} + 13) * i) % 30 + 1 as int)) END))")

    if planted:
        text = (f"CASE WHEN ix % {BOILER_EVERY} = 0 THEN '{BOILER}' "
                f"ELSE {unique_text('ix')} END")
        base = spark.range(N_OLD).withColumnRenamed("id", "ix")
        doc_id = _scramble("ix")
    else:
        # new index space sits ABOVE the old one inside the scramble's
        # domain. The exact-copy target must itself be a unique_text old
        # doc, never a template slot (+1 bump).
        tgt = (f"((ix * 7) % {N_OLD} + CASE WHEN (ix * 7) % {N_OLD} "
               f"% {BOILER_EVERY} = 0 THEN 1 ELSE 0 END)")
        text = (
            f"CASE WHEN ix % {NEW_EXACT_EVERY} = 0 THEN "
            f"{unique_text(tgt)} "
            f"WHEN ix % {NEW_BOILER_EVERY} = 0 THEN "
            f"replace('{BOILER}', 'cookies', concat('c', cast(ix as string)))"
            f" ELSE {unique_text(f'(ix + {N_OLD * 9})')} END")
        base = spark.range(N_NEW).withColumnRenamed("id", "ix")
        doc_id = _scramble(f"(ix + {N_OLD})")
    return base.select(F.expr(doc_id).alias("doc_id"),
                       F.expr(text).alias("text"))


def main() -> int:
    from bdtopo2refhydro_spark.operators.text import (
        incremental_dedup,
        lsh_bands,
    )
    from bdtopo2refhydro_spark.session import get_spark

    # 1024 shuffle partitions: the 9.6M-row old band table spreads to a
    # ~9.4k-row (~420KB) median partition, so each planted 240k-row hot
    # bucket (~2.9MB — its repeated band_key compresses away; see module
    # docstring) clears BOTH the factor=5 ratio bar and the width-scaled
    # byte threshold.
    spark = get_spark("text_scale_check", cores=32, shuffle_partitions=1024)
    for k, v in {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }.items():
        spark.conf.set(k, v)

    old = _corpus(spark, N_OLD, planted=True).localCheckpoint()
    new = _corpus(spark, N_NEW, planted=False).localCheckpoint()
    n_old, n_new = old.count(), new.count()
    print(f"old={n_old:,} new={n_new:,}")

    # -- 1. the skew observation: the SAME banded new×old join shape ----
    t0 = time.monotonic()
    nb = lsh_bands(new).localCheckpoint(eager=False)
    ob = lsh_bands(old).localCheckpoint(eager=False)
    cand = (
        nb.select(F.col("doc_id").alias("n_id"), "band_idx", "band_key")
        .join(ob.select(F.col("doc_id").alias("o_id"), "band_idx",
                        "band_key"), ["band_idx", "band_key"])
        .select("n_id", "o_id").distinct()
    )
    # Count THROUGH an agg built on top of the join df: counted's own QE
    # contains the join, so collecting it finalizes the join's adaptive
    # plan (df.count() spawns a separate QE — Spark 4 subtlety pinned in
    # test_plan_shapes) without hauling ~11M candidate pairs into the
    # Python driver.
    counted = cand.groupBy().count()
    n_pairs = counted.collect()[0][0]
    plan = counted._jdf.queryExecution().executedPlan().toString()
    has_skew = "skew=true" in plan
    print(f"band join: {n_pairs:,} candidate pairs in "
          f"{time.monotonic() - t0:.1f}s; skew=true in final plan: "
          f"{has_skew}")
    assert "isFinalPlan=true" in plan
    assert has_skew, "AQE did not split the hot band bucket"
    # the hot bucket dominates: template pairs = new_boiler × old_boiler
    new_boiler = sum(1 for i in range(N_NEW)
                     if i % NEW_EXACT_EVERY != 0 and i % NEW_BOILER_EVERY == 0)
    old_boiler = (N_OLD + BOILER_EVERY - 1) // BOILER_EVERY
    assert n_pairs >= new_boiler * old_boiler, (n_pairs, new_boiler,
                                                old_boiler)

    # -- 2. the value check: full incremental_dedup, closed form --------
    t0 = time.monotonic()
    flags = incremental_dedup(new, old, threshold=0.5)
    got = (
        flags.groupBy("dropped_exact", "dropped_near").count()
        .collect()
    )
    wall = time.monotonic() - t0
    by = {(r["dropped_exact"], r["dropped_near"]): r["count"] for r in got}
    n_exact = sum(v for (e, _), v in by.items() if e)
    n_near_only = by.get((False, True), 0)
    n_keep = by.get((False, False), 0)
    exp_exact = sum(1 for i in range(N_NEW) if i % NEW_EXACT_EVERY == 0)
    exp_near = new_boiler
    print(f"incremental_dedup in {wall:.1f}s: exact={n_exact:,} "
          f"(exp {exp_exact:,}) near={n_near_only:,} (exp {exp_near:,}) "
          f"keep={n_keep:,}")
    assert n_exact == exp_exact, (n_exact, exp_exact)
    assert n_near_only == exp_near, (n_near_only, exp_near)
    assert n_exact + n_near_only + n_keep == N_NEW
    print("PASS")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
