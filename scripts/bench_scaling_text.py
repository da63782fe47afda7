"""Scaling-efficiency evidence for the TEXT-CURATION pipeline (north rule,
second workload family): run corpus_manifest — exact dedup (md5 digests) +
token explode/count + integer quality gates + per-source rollup — on the
SAME multi-million-document input at two parallelism levels and report
throughput at both plus efficiency = (tp_4N / tp_N) / (4N/N).

Same measurement discipline as scripts/bench_scaling.py (which covers the
spatial/graph workload): identical input bytes and partition decomposition
at every level, fixed shuffle partitioning (AQE coalescing off so the work
split is a controlled variable), median of ATTEMPTS fresh-JVM runs per
level, integer result checksums asserted identical across every run and
level, and a pure-python OS-process calibration of the box's own N→4N
ceiling measured before the Spark runs. Levels stay ≤ 8 so the 32-core
box is never saturated (see BENCH/BASELINE.md for why).

The fixture embeds the structure the pipeline exists for: ~10% exact
duplicates (doc_id folded onto a smaller id space) and ~9% repetitive
documents (single-token spam that the integer Gopher gate must drop), so
the dedup and gating stages do real work at every level.

Usage:
  python scripts/bench_scaling_text.py          # orchestrates all runs
  python scripts/bench_scaling_text.py --run 8  # one measured run (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALING_TEXT_N_DOCS", "2200000"))
N_PARTS = int(os.environ.get("SCALING_TEXT_N_PARTS", "64"))
ATTEMPTS = int(os.environ.get("SCALING_TEXT_ATTEMPTS", "3"))
DOCS_PARQUET = os.environ.get("SCALING_TEXT_DOCS_DIR",
                              "/tmp/scaling_docs_parquet")
PAIRS = ((2, 8),)
LEVELS = sorted({c for p in PAIRS for c in p})

_VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
          "omega red green blue cyan magenta yellow").split()


def _burn(_):
    x = 0
    for i in range(1_500_000):
        x += i * i % 7
    return x


def calibrate() -> dict[tuple[int, int], float]:
    import multiprocessing

    walls: dict[int, float] = {}
    for n in LEVELS:
        t0 = time.monotonic()
        with multiprocessing.Pool(n) as p:
            p.map(_burn, range(128))
        walls[n] = time.monotonic() - t0
    return {(a, b): (walls[a] / walls[b]) / (b / a) for a, b in PAIRS}


def prep_input() -> None:
    """Deterministic corpus, generated JVM-side and landed as N_PARTS
    parquet files: base_id = doc_id % (0.9·N) makes ~10% of documents
    byte-identical to an earlier one; every 11th base_id is single-token
    spam the repetition gate must reject; the rest are 20-49 token strings
    over a 30-word vocabulary."""
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.session import get_spark

    spark = get_spark("text_scaling_prep", cores=32,
                      shuffle_partitions=N_PARTS)
    distinct = N_DOCS * 9 // 10
    vocab = ", ".join(f"'{w}'" for w in _VOCAB)
    text = f"""
      CASE WHEN (doc_id % {distinct}) % 11 = 0 THEN
        concat_ws(' ', transform(sequence(1, 20 + (doc_id % {distinct}) % 30),
                                 i -> 'spam'))
      ELSE
        concat_ws(' ', transform(sequence(1, 20 + (doc_id % {distinct}) % 30),
          i -> element_at(array({vocab}),
                          cast(((doc_id % {distinct}) * i) % 30 + 1 as int))))
      END"""
    (
        spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.expr(text).alias("text"),
            F.concat(F.lit("s"), (F.col("doc_id") % 20).cast("string"))
            .alias("source"),
        )
        .repartition(N_PARTS)
        .write.mode("overwrite").parquet(DOCS_PARQUET)
    )
    spark.stop()


def run_job(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.operators.text import corpus_manifest
    from bdtopo2refhydro_spark.session import get_spark

    spark = get_spark(
        f"text_scaling_{cpus}", cores=cpus, shuffle_partitions=N_PARTS,
        # identical work decomposition at every level (see bench_scaling.py)
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    docs = spark.read.parquet(DOCS_PARQUET) \
        .repartition(N_PARTS).localCheckpoint()
    n = docs.count()  # materialize input outside the timed window

    t0 = time.monotonic()
    out = corpus_manifest(docs)
    # all-integer manifest → the checksum asserts bit-identity across
    # levels with no float rounding concession
    chk = out.select(
        F.count("*").alias("rows"),
        F.expr(
            "bit_xor(xxhash64(source, docs_total, docs_after_dedup, "
            "docs_kept, tokens_kept))"
        ).alias("chk"),
    ).first()
    wall = time.monotonic() - t0
    spark.stop()
    return {"cpus": cpus, "docs": n, "wall_sec": round(wall, 2),
            "docs_per_sec": round(n / wall, 1), "result_rows": chk["rows"],
            "checksum": chk["chk"]}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--prep":
        prep_input()
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print(json.dumps(run_job(int(sys.argv[2]))))
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(DOCS_PARQUET):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--prep"],
            check=True, timeout=3600, cwd=repo,
        )
        time.sleep(10)  # let the 32-core prep's thermal state settle
    ceilings = calibrate()
    # Interleaved rounds: each round runs EVERY level back-to-back
    # (2 then 8), so a monotone box-clock drift (CLAUDE.md: 2x within
    # hours) biases both levels of a round equally instead of hitting
    # whichever level happens to run last. The headline is the MEDIAN
    # of per-round efficiencies — robust to one slow round — rather
    # than a ratio of medians taken hours apart.
    raw: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for _ in range(ATTEMPTS):
        for cpus in LEVELS:
            time.sleep(5)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run",
                 str(cpus)],
                capture_output=True, text=True, timeout=3600, cwd=repo,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            raw[cpus].append(json.loads(line))
            print(raw[cpus][-1])
    results: dict[int, dict] = {}
    for cpus in LEVELS:
        attempts = sorted(raw[cpus], key=lambda r: r["wall_sec"])
        med = dict(attempts[len(attempts) // 2])
        med["walls_all"] = [a["wall_sec"] for a in attempts]
        results[cpus] = med
    checks = {r["checksum"] for lvl in raw.values() for r in lvl}
    assert len(checks) == 1, f"results differ across levels: {checks}"
    pair_rows = []
    round_effs: dict[tuple[int, int], list[float]] = {}
    for a, b in PAIRS:
        effs = sorted(
            (rb["docs_per_sec"] / ra["docs_per_sec"]) / (b / a)
            for ra, rb in zip(raw[a], raw[b])
        )
        round_effs[(a, b)] = effs
        eff = effs[len(effs) // 2]
        pair_rows.append((a, b, eff, ceilings[(a, b)]))
    ha, hb, heff, hceil = max(pair_rows, key=lambda r: r[2])
    level_tbl = "\n".join(
        f"| {c} | {results[c]['wall_sec']} | {results[c]['walls_all']} "
        f"| {results[c]['docs_per_sec']:,} |"
        for c in LEVELS
    )
    pair_tbl = "\n".join(
        f"| {a} → {b} | {eff:.3f} | {ceil:.3f} | {eff / ceil:.3f} "
        f"| {[round(e, 3) for e in round_effs[(a, b)]]} |"
        for a, b, eff, ceil in pair_rows
    )
    md = f"""# BENCH — text-curation scaling efficiency (N vs 4N)

Job: `corpus_manifest` — exact dedup (16-byte digest shuffle) + token
explode/count (map-side combined) + integer length/repetition gates +
per-source rollup — over {results[LEVELS[0]]['docs']:,} synthetic documents
(~10% exact duplicates, ~9% single-token spam the gate drops). Identical
input ({N_PARTS}-partition decomposition, {N_PARTS} shuffle partitions),
{ATTEMPTS} interleaved rounds (each round runs N then 4N back-to-back,
so clock drift biases both levels equally); headline = median of
per-round efficiencies. The all-integer result
checksum is asserted identical across every run and level. Companion to
BENCH/BASELINE.md (spatial/graph workload) — same discipline, second
workload family.

| cores | median wall (s) | all walls (s) | throughput (docs/sec) |
|---|---|---|---|
{level_tbl}

| pair N → 4N | engine efficiency | machine ceiling* | engine/ceiling | per-round effs |
|---|---|---|---|---|
{pair_tbl}

**Headline: N={ha} → 4N={hb}, scaling efficiency = {heff:.3f}**
(median of per-round interleaved efficiencies)
(target ≥ 0.8; machine ceiling for this pair {hceil:.3f},
engine/ceiling = {heff / hceil:.3f}).

*Machine ceiling: see BENCH/BASELINE.md — fixed pure-python work in plain
OS processes at N vs 4N, measured before the Spark runs on the idle box.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/TEXT_SCALING.md", "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    raise SystemExit(main())
