"""The incremental-refresh flagship: a per-crawl-snapshot update pipeline.

Where ``plans/curation.py`` is the one-shot batch curation of a corpus,
this is the pipeline a production crawl runs EVERY snapshot — nothing
re-processes the existing corpus:

    snapshot diff (digest full-outer join → added / changed keys)
      → incremental dedup of the candidates against the OLD corpus only
        (exact digest match + asymmetric new×old MinHash-LSH bands
        verified by exact n-gram Jaccard — never old×old)
      → integer token gate on the survivors
      → per-source admission manifest

Every stage is integer/string-exact, so the WHOLE composition carries an
exact unrolled SQL oracle (driver query ``refresh_pipeline``), same
discipline as the curation capstone: the point is that the operators
compose without semantic seams.

Scale shape: the old corpus contributes only digests and band keys (its
text bytes never shuffle); candidates are the snapshot delta, not the
snapshot; Jaccard shingles materialize only for docs inside a candidate
band pair; the final manifest shuffles (source, flags, token count)
rows on the low-cardinality source key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cdc import snapshot_diff
from ..operators.text import incremental_dedup


def run_refresh_pipeline(old: DataFrame, new: DataFrame, *,
                         threshold: float = 0.5,
                         min_tokens: int = 3) -> DataFrame:
    """Returns the per-source admission manifest: (source, n_candidates,
    n_exact, n_near, n_gate_failed, n_admitted, tok_admitted). The four
    outcome counts partition the candidates: exact-dup wins over
    near-dup wins over the token gate."""
    diff = snapshot_diff(old, new, "doc_id", ["text", "lang", "source"])
    delta_keys = diff.filter(F.col("change").isin("added", "changed")) \
        .select("doc_id")
    cand = new.join(delta_keys, "doc_id", "left_semi") \
        .localCheckpoint(eager=False)

    flags = incremental_dedup(cand, old, threshold=threshold)
    toks = cand.select(
        "doc_id", "source",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        .cast("bigint").alias("n_tok"),
    )
    outcome = toks.join(flags, "doc_id").select(
        "source", "n_tok", "dropped_exact", "dropped_near",
        (F.col("n_tok") >= min_tokens).alias("gate_ok"),
    )
    admitted = (~F.col("dropped_exact") & ~F.col("dropped_near")
                & F.col("gate_ok"))
    return outcome.groupBy("source").agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.col("dropped_exact").cast("long")).alias("n_exact"),
        F.sum((~F.col("dropped_exact") & F.col("dropped_near"))
              .cast("long")).alias("n_near"),
        F.sum((~F.col("dropped_exact") & ~F.col("dropped_near")
               & ~F.col("gate_ok")).cast("long")).alias("n_gate_failed"),
        F.sum(admitted.cast("long")).alias("n_admitted"),
        F.sum(F.when(admitted, F.col("n_tok")).otherwise(0))
        .cast("bigint").alias("tok_admitted"),
    )
