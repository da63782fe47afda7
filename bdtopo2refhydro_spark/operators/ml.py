"""Distributed model TRAINING primitives (inference lives in
text.py:linear_classifier_score, clustering in ann.py:kmeans_centroids).

A crawl-curation pipeline trains small models constantly — quality
gates, spam stumps, routing rules. The training loop that matters at
100 TB is the one that is a handful of scans + aggregations, not a
parameter server; a depth-1 decision tree (stump) over integer
features is the canonical example and the weak learner of boosting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def decision_stump(df: DataFrame, feature_cols: list[str],
                   label_col: str = "y") -> DataFrame:
    """Exact decision-stump candidate scoring: for every (feature,
    threshold) split, the Gini purity gain as an EXACT integer
    rational — no float accumulates, so training replays bitwise.

    For split v <= t with left/right class counts (pos_l, n_l) /
    (pos_r, n_r), minimizing weighted Gini impurity is maximizing

        score = num / den,
        num = (pos_l² + neg_l²)·n_r + (pos_r² + neg_r²)·n_l
        den = n_l · n_r

    (clear the 1/n_l, 1/n_r denominators; drop the constant n).
    num, den are BIGINT-exact for n up to ~10⁶ rows per feature; the
    one double division used for ranking is a single IEEE op on exact
    integers — deterministic everywhere.

    Plan: one groupBy (feature, value) over the stacked features
    (partial-aggregated map-side: the shuffle carries |distinct
    values| rows, not |rows|), then per-feature cumulative windows —
    the window key is the FEATURE (a handful of partitions, each
    holding only the distinct thresholds). Returns every candidate
    with (n_l, n_r, num, den, score, is_best).
    """
    k = len(feature_cols)
    pairs = ", ".join(f"'{c}', {c}" for c in feature_cols)
    stacked = df.select(
        F.expr(f"stack({k}, {pairs}) AS (feature, v)"),
        F.col(label_col).cast("long").alias("_y"))
    per_v = (stacked.groupBy("feature", "v")
             .agg(F.count("*").alias("_n"), F.sum("_y").alias("_pos")))
    w_cum = (Window.partitionBy("feature").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = (Window.partitionBy("feature")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    cand = per_v.select(
        "feature", F.col("v").alias("threshold"),
        F.sum("_n").over(w_cum).alias("n_l"),
        F.sum("_pos").over(w_cum).alias("pos_l"),
        F.sum("_n").over(w_all).alias("n_t"),
        F.sum("_pos").over(w_all).alias("pos_t"))
    n_l, pos_l = F.col("n_l"), F.col("pos_l")
    n_r = F.col("n_t") - n_l
    pos_r = F.col("pos_t") - pos_l
    neg_l = n_l - pos_l
    neg_r = n_r - pos_r
    num = ((pos_l * pos_l + neg_l * neg_l) * n_r
           + (pos_r * pos_r + neg_r * neg_r) * n_l)
    den = n_l * n_r
    scored = (cand.where(n_r > 0)
              .select("feature", "threshold",
                      n_l.cast("long").alias("n_l"),
                      n_r.cast("long").alias("n_r"),
                      num.cast("long").alias("num"),
                      den.cast("long").alias("den"),
                      (num.cast("double") / den.cast("double"))
                      .alias("score")))
    w_rank = Window.orderBy(F.desc("score"), "feature", "threshold")
    return scored.withColumn(
        "is_best", F.row_number().over(w_rank) == 1)
