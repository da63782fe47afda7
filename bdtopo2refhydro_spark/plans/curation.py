"""The webtext flagship: an end-to-end corpus curation pipeline.

Composes the individually-verified curation operators into the single
plan a training-data team runs before tokenization:

    exact dedup (md5, keep lowest id)
      → integer quality gates (min length + Gopher repetition)
      → test-set decontamination (shared-shingle flag vs a benchmark)
      → per-domain cap (longest-first)
      → contiguous token-shard packing (per-source window running sum)

Every stage is integer/string-exact, so the WHOLE composition carries an
exact unrolled SQL oracle (driver query ``curation_pipeline``) — the
point is verifying that the operators compose without semantic seams,
not just that each passes alone.

Scale shape: document bodies are read once for hashing/token stats and
never shuffled — the dedup shuffle moves 16-byte digests, the gates are
map-side arithmetic, decontamination broadcasts the benchmark shingles,
and the cap/pack stages shuffle only (id, source, counts) rows on the
low-cardinality source key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import corpus as C
from ..operators import text as TX
from ..operators.text import tokens_expr


def run_curation_pipeline(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    min_tokens: int = 10,
    rep_factor: int = 5,
    decontam_k: int = 3,
    domain_cap_n: int = 15,
    shard_budget: int = 2048,
) -> DataFrame:
    """Returns (doc_id, source, n_tokens, shard, tok_offset) for every
    document that survives all four gates, packed into per-source token
    shards. Deterministic end-to-end: reruns and resumes produce
    identical shard assignments."""
    toks = tokens_expr()
    base = docs.select(
        "doc_id", "source", "n_chars",
        F.md5(F.col("text").cast("binary")).alias("text_hash"),
        F.size(F.expr(toks)).cast("long").alias("n_tokens"),
    )
    keep = base.groupBy("text_hash").agg(F.min("doc_id").alias("keep_id"))
    top = (
        docs.select("doc_id", F.explode(F.expr(toks)).alias("tok"))
        .groupBy("doc_id", "tok").count()
        .groupBy("doc_id").agg(F.max("count").alias("top_token_count"))
    )
    surv = (
        base.join(keep, "text_hash")
        .join(top, "doc_id")
        .filter(
            (F.col("doc_id") == F.col("keep_id"))
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("top_token_count") * rep_factor <= F.col("n_tokens"))
        )
        .select("doc_id", "source", "n_chars", "n_tokens")
    )
    clean_ids = (
        TX.decontaminate(docs, benchmark, k=decontam_k)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    surv = surv.join(clean_ids, "doc_id", "left_semi")
    capped = C.domain_cap(surv, domain_cap_n, domain_col="source",
                          id_col="doc_id").drop("rank_in_domain", "n_chars")
    return C.pack_shards(capped, shard_budget, tokens_col="n_tokens",
                         group_col="source", id_col="doc_id")
