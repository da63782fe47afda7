"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline (O(N·M) pairs via a
broadcast join — fine when the query set is small). The scale path is
LSH-bucketed search: deterministic random-hyperplane signatures cut the
candidate set to same-bucket vectors, turning the pair join into an
equi-join exactly like the spatial cell join (one shuffle on the bucket
key, AQE-splittable).

Dot products run JVM-side via zip_with + aggregate with explicit DOUBLE
accumulation (sequential left fold — bit-identical to the DuckDB oracle's
list_sum over per-element double products).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def plane_signs(n_planes: int = N_PLANES, dim: int = 64) -> list[list[int]]:
    """Deterministic ±1 hyperplane weights: sign = parity of the first hex
    digit of md5(f"{plane}_{dim}"). Computed driver-side once — identical
    constants reach every executor and the SQL oracle."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str):
    return F.sqrt(
        F.aggregate(F.col(a), F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(embeddings: DataFrame, queries: DataFrame | None = None,
                k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).
    queries defaults to the corpus itself. Returns (query_id, neighbor_id,
    rank, cos_sim). The smaller side should be `queries` — it is broadcast."""
    corpus = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                               F.col("embedding").alias("emb_n"))
    q = (queries or embeddings).select(F.col("vec_id").alias("query_id"),
                                       F.col("embedding").alias("emb_q"))
    pairs = corpus.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cos_sim", _dot("emb_q", "emb_n") / (_norm("emb_q") * _norm("emb_n"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def hyperplane_signature(embeddings: DataFrame, n_planes: int = N_PLANES,
                         dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH signature using the deterministic plane_signs
    constants — pure arithmetic, whole-stage codegen'd."""
    signs = plane_signs(n_planes, dim)
    sig = F.lit(0)
    for p in range(n_planes):
        terms = F.expr(
            " + ".join(
                f"({signs[p][j]}.0 * cast(element_at(embedding, {j + 1}) as double))"
                for j in range(dim)
            )
        )
        sig = sig + F.when(terms > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return embeddings.select("vec_id", "embedding", sig.alias("bucket"))


def lsh_ann_topk(embeddings: DataFrame, k: int = 5,
                 n_planes: int = N_PLANES, dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates restricted to the same hyperplane
    bucket. Recall rises with fewer planes (bigger buckets); the scale knob
    is n_planes, semantics stay top-k-of-candidates."""
    sig = hyperplane_signature(embeddings, n_planes, dim)
    left = sig.select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("emb_q"), "bucket")
    right = sig.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").alias("emb_n"), "bucket")
    pairs = left.join(right, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn(
        "cos_sim", _dot("emb_q", "emb_n") / (_norm("emb_q") * _norm("emb_n"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_dup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                     n_planes: int = N_PLANES, dim: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket join
    for candidate generation (same-bucket ⇒ small angle), exact cosine
    verify ≥ threshold. Returns (a, b, cos_sim) with a < b. Like the text
    LSH, the signature table is materialized before the self-join so the
    signature arithmetic runs once."""
    sig = hyperplane_signature(embeddings, n_planes, dim) \
        .localCheckpoint(eager=False)
    left = sig.select(F.col("vec_id").alias("a"),
                      F.col("embedding").alias("emb_a"), "bucket")
    right = sig.select(F.col("vec_id").alias("b"),
                       F.col("embedding").alias("emb_b"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cos_sim", _dot("emb_a", "emb_b") / (_norm("emb_a") * _norm("emb_b"))
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
        .distinct()
    )


N_CENTROIDS = 16


def ivf_assign(embeddings: DataFrame, n_centroids: int = N_CENTROIDS,
               ) -> DataFrame:
    """IVF coarse quantization: centroids = the n_centroids lowest-vec_id
    vectors (deterministic seed choice — a production system would k-means
    them; the assignment/search plumbing is identical), every vector
    assigned to its max-cosine centroid. Returns (vec_id, embedding,
    bucket). The centroid table broadcasts; assignment is one map-side
    pass + a row_number per vector."""
    c = embeddings.orderBy("vec_id").limit(n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cemb")
    )
    scored = embeddings.crossJoin(F.broadcast(c)).withColumn(
        "cs", _dot("embedding", "cemb") / (_norm("embedding") * _norm("cemb"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cent_id").alias("bucket"))
    )


def ivf_ann_topk(embeddings: DataFrame, k: int = 5,
                 n_centroids: int = N_CENTROIDS) -> DataFrame:
    """IVF approximate top-k (probe=1): candidates restricted to the same
    coarse cell. Recall knob: n_centroids down (bigger cells) or probe>1
    (join the q-side to its top-p cells). Same materialize-before-self-join
    discipline as the LSH operators."""
    sig = ivf_assign(embeddings, n_centroids).localCheckpoint(eager=False)
    q = sig.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("emb_q"), "bucket")
    cdd = sig.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("embedding").alias("emb_n"), "bucket")
    scored = (
        q.join(cdd, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim",
                    _dot("emb_q", "emb_n") / (_norm("emb_q") * _norm("emb_n")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                               F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
