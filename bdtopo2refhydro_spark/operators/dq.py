"""Data-quality operators: column profiling and declarative constraint
checks (Deequ-style) — the monitoring layer a continuously-ingesting
corpus pipeline runs on every snapshot before it reaches training.

The reference validates its inputs ad hoc (schema asserts in the
extract scripts); at crawl scale validation must be a first-class
distributed pass with a machine-readable report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profile: (column, n, n_null, n_distinct,
    min_str, max_str) per profiled column.

    Values are melted to (column, value-as-string) rows with a
    ``stack``, then ONE hash aggregate computes every metric — a single
    shuffle on the column name (bounded by the schema width, never by
    the data), with map-side partial aggregation collapsing each
    partition to ≤|cols| rows before it. min/max are lexicographic on
    the string form (both engines use codepoint order, so the driver
    oracle replays it); n_distinct is exact and excludes NULL.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    pairs = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in cols
    )
    melted = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) as (column, value)"))
    return melted.groupBy("column").agg(
        F.count("*").alias("n"),
        (F.count("*") - F.count("value")).alias("n_null"),
        F.countDistinct("value").alias("n_distinct"),
        F.min("value").alias("min_str"),
        F.max("value").alias("max_str"),
    )


def check_constraints(df: DataFrame,
                      rules: list[tuple[str, str | Column]]) -> DataFrame:
    """Evaluate declarative row-level constraints in ONE pass: rules are
    (name, boolean SQL expression over the row); returns one row per
    rule — (rule, n_checked, n_violations, passed). A NULL predicate
    result counts as a violation (unknown is not proof of quality).

    Everything folds into a single global aggregate: no shuffle at all
    beyond the final 1-partition reduce, whatever the corpus size, and
    every rule shares the same scan. Table-level rules (key uniqueness)
    don't fit a row predicate — see ``check_unique``.
    """
    aggs = []
    for name, pred in rules:
        p = F.expr(pred) if isinstance(pred, str) else pred
        viol = F.sum(
            F.when(~F.coalesce(p, F.lit(False)), 1).otherwise(0)
        ).cast("bigint")
        aggs.append(viol.alias(f"v_{name}"))
    counted = df.agg(F.count("*").cast("bigint").alias("n"), *aggs)
    rows = ", ".join(
        f"'{name}', v_{name}" for name, _ in rules
    )
    return counted.select(
        "n", F.expr(f"stack({len(rules)}, {rows}) as (rule, n_violations)")
    ).select(
        "rule",
        F.col("n").alias("n_checked"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Table-level uniqueness check: (rule, n_checked, n_violations,
    passed) where a violation is every row beyond the first of a
    duplicated key. One groupBy on the key (map-side combinable) + a
    1-row reduce."""
    dup = (
        df.groupBy(*key_cols).agg(F.count("*").alias("c"))
        .agg(
            F.sum("c").cast("bigint").alias("n_checked"),
            F.sum(F.col("c") - 1).cast("bigint").alias("n_violations"),
        )
    )
    return dup.select(
        F.lit("unique:" + ",".join(key_cols)).alias("rule"),
        "n_checked", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def drift_check(events: DataFrame, *, time_col: str = "ts",
                group_col: str = "event_type",
                threshold_pct: int = 50) -> DataFrame:
    """Day-over-day volume drift monitor: per (group, day) row counts,
    integer percent change vs the group's PREVIOUS observed day, and a
    drift flag at |change| > threshold_pct — the freshness/volume alarm
    a production ingest runs after every snapshot.

    First observed day per group has no baseline: change_pct = 0, never
    flagged. All arithmetic is integer (100·(cur−prev) div prev), so
    any engine replays it exactly. One shuffle for the (group, day)
    count (map-side combinable), one window pass on the tiny post-agg
    table."""
    daily = (
        events.select(F.col(group_col).alias("grp"),
                      F.to_date(time_col).cast("string").alias("day"))
        .groupBy("grp", "day").agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("grp").orderBy("day")
    prev = F.lag("n").over(w)
    change = F.expr("case when prev_n is null then cast(0 as bigint) "
                    "else (100 * (n - prev_n)) div prev_n end")
    return (
        daily.withColumn("prev_n", prev)
        .withColumn("change_pct", change)
        .withColumn("drifted",
                    F.abs(F.col("change_pct")) > threshold_pct)
        .select("grp", "day", "n",
                F.coalesce("prev_n", F.lit(0)).alias("prev_n"),
                "change_pct", "drifted")
    )


def pearson_pairs(df: DataFrame, cols: list[str],
                  pairs: list[tuple[str, str]] | None = None) -> DataFrame:
    """Pairwise Pearson correlation from exact integer sums, one pass.

    ``cols`` must be integer-valued columns (callers derive cents /
    counts first): every accumulated moment (n, Σx, Σx², Σxy) is then
    an exact BIGINT, so the final r = (nΣxy − ΣxΣy) /
    (√(nΣx²−ΣxΣx)·√(nΣy²−ΣyΣy)) is a fixed dag of exact-double ops —
    bit-identical across engines (unlike streaming Welford/co-moment
    updates, whose value depends on row order). One aggregate computes
    every moment; the per-pair rows are exploded from that single row,
    so the input is scanned exactly once regardless of pair count —
    the 100 TB-friendly shape for a correlation matrix.
    Returns (x_name, y_name, n, r).
    """
    if pairs is None:
        pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).cast("bigint").alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).cast("bigint")
                    .alias(f"ss_{c}"))
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).cast("bigint")
                    .alias(f"sp_{a}_{b}"))
    g = df.agg(*aggs)
    n = F.col("n")

    def _r(a: str, b: str) -> Column:
        num = (n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}"))
        da = F.sqrt((n * F.col(f"ss_{a}")
                     - F.col(f"s_{a}") * F.col(f"s_{a}")).cast("double"))
        db = F.sqrt((n * F.col(f"ss_{b}")
                     - F.col(f"s_{b}") * F.col(f"s_{b}")).cast("double"))
        return num.cast("double") / (da * db)

    structs = [
        F.struct(F.lit(a).alias("x_name"), F.lit(b).alias("y_name"),
                 _r(a, b).alias("r"))
        for a, b in pairs
    ]
    return (
        g.select("n", F.explode(F.array(*structs)).alias("p"))
        .select("p.x_name", "p.y_name", "n", "p.r")
    )


def rolling_outliers(df: DataFrame, *, key_col: str, order_col: str,
                     value_col: str, window: int = 8,
                     t_sq: int = 9) -> DataFrame:
    """Rolling z-score anomaly flags in EXACT integer arithmetic: flag
    a point whose squared deviation from its trailing-window mean
    exceeds ``t_sq`` times the window variance — the standard
    streaming-telemetry outlier gate, made bit-replayable by clearing
    denominators instead of dividing.

    |x - s/n|^2 > t^2 * (s2/n - s^2/n^2)  multiplied through by n^2:
        (n*x - s)^2  >  t_sq * (n*s2 - s^2)
    with s = rolling sum, s2 = rolling sum of squares, n = rolling
    count — all BIGINT, so Spark and any replay engine agree bitwise
    (no float variance). One Exchange (hash on key) + one Window; only
    full windows are eligible. Returns the flagged rows with the two
    integer diagnostics (lhs, rhs).
    """
    w = (Window.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(-(window - 1), Window.currentRow))
    x = F.col(value_col).cast("long")
    stats = df.select(
        key_col, order_col, x.alias("x"),
        F.count("*").over(w).alias("n_w"),
        F.sum(x).over(w).alias("s"),
        F.sum(x * x).over(w).alias("s2"))
    # NOT `** 2`: Column.__pow__ lowers to pow() which returns DOUBLE —
    # an explicit self-multiply keeps the whole predicate in BIGINT.
    dev = F.col("n_w") * F.col("x") - F.col("s")
    lhs = dev * dev
    rhs = F.lit(t_sq) * (F.col("n_w") * F.col("s2")
                         - F.col("s") * F.col("s"))
    return (stats.where(F.col("n_w") == window)
            .withColumn("lhs", lhs.cast("long"))
            .withColumn("rhs", rhs.cast("long"))
            .where(F.col("lhs") > F.col("rhs"))
            .drop("n_w", "s", "s2"))


def welch_t_stats(df: DataFrame, *, group_col: str, variant_col: str,
                  value_col: str) -> DataFrame:
    """Welch's two-sample t statistic per experiment group — the A/B
    readout every growth/quality experiment on a crawl pipeline ends
    with. One distributed aggregation computes integer (n, Σx, Σx²)
    per (group, variant); the t statistic and Welch–Satterthwaite
    degrees of freedom are then derived on those exact integers with a
    FIXED sequence of IEEE-754 ops, so any engine that mirrors the
    expression tree reproduces the doubles bit-for-bit (each +,-,*,/,
    sqrt on identical operands is deterministic; only float
    *aggregation order* is not — and no float is ever aggregated).

    Exactly one shuffle (hash on (group, variant)); the pivot to
    variant-a/variant-b columns is a width-2 groupBy on `group_col`,
    partial-aggregated map-side. Scale: output is |groups| rows —
    millions of experiment cells stream through one Exchange.
    """
    x = F.col(value_col).cast("long")
    per = (df.groupBy(group_col, variant_col)
           .agg(F.count("*").alias("n"),
                F.sum(x).alias("s"),
                F.sum(x * x).alias("s2")))
    a = F.col(variant_col) == 0
    piv = (per.groupBy(group_col)
           .agg(F.sum(F.when(a, F.col("n"))).alias("na"),
                F.sum(F.when(a, F.col("s"))).alias("sa"),
                F.sum(F.when(a, F.col("s2"))).alias("s2a"),
                F.sum(F.when(~a, F.col("n"))).alias("nb"),
                F.sum(F.when(~a, F.col("s"))).alias("sb"),
                F.sum(F.when(~a, F.col("s2"))).alias("s2b")))
    # fixed IEEE op order; mirrored textually by the SQL oracle
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma = F.col("sa") / na
    mb = F.col("sb") / nb
    va = (F.col("s2a") - F.col("sa") * ma) / (na - F.lit(1.0))
    vb = (F.col("s2b") - F.col("sb") * mb) / (nb - F.lit(1.0))
    qa = va / na
    qb = vb / nb
    se2 = qa + qb
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (qa * qa / (na - F.lit(1.0))
                         + qb * qb / (nb - F.lit(1.0)))
    return (piv.where(F.col("na") >= 2).where(F.col("nb") >= 2)
            .select(group_col,
                    F.col("na").cast("long").alias("na"),
                    F.col("nb").cast("long").alias("nb"),
                    ma.alias("mean_a"), mb.alias("mean_b"),
                    t.alias("t_stat"), dof.alias("welch_df")))


def ewma_half(df: DataFrame, *, key_col: str, order_col: str,
              value_col: str, max_n: int = 24) -> DataFrame:
    """Exponentially weighted moving average with alpha = 1/2, exact.

    s_1 = x_1;  s_t = (s_{t-1} + x_t) / 2.  Closed form:
        s_t = (x_1 + Σ_{i=2..t} 2^{i-2} · x_i) / 2^{t-1}
    The numerator is an INTEGER window sum (coefficients are powers of
    two via shiftleft — no float accumulates), and the final step is
    one division by a power of two: exact in IEEE-754 whenever the
    numerator < 2^53. With values < 2^20 and max_n = 24 the numerator
    is ≤ 2^(20+22+5) < 2^53, so the result is bit-replayable on any
    engine — the usual "EWMA is order-dependent float" objection is
    engineered away.

    One Exchange (hash on key) + one Window; rows past ``max_n`` per
    key are dropped to keep the integer bound (callers smoothing long
    series should re-anchor per window — at crawl scale EWMA is only
    ever consumed over bounded trailing windows anyway).
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    x = F.col(value_col).cast("long")
    rn = F.row_number().over(w)
    base = (df.select(key_col, order_col, x.alias("x"))
            .withColumn("rn", rn).where(F.col("rn") <= max_n))
    # F.shiftleft's numBits must be a python int — go through the SQL
    # function, which accepts a column expression for the shift amount
    coef = F.when(F.col("rn") == 1, F.lit(1).cast("long")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), rn - 2)"))
    cum = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    num = F.sum(coef * F.col("x")).over(cum)
    ewma = num.cast("double") / F.pow(F.lit(2.0), F.col("rn") - 1)
    return base.select(key_col, order_col, "x", "rn",
                       ewma.alias("ewma"))


def merkle_levels(df: DataFrame, leaf_digest: Column,
                  order_col: str, *, max_levels: int = 48) -> DataFrame:
    """Merkle tree over a table — the integrity/sync primitive (two
    snapshots with equal roots are provably identical; differing
    subtree digests localize a diff without rescanning payloads):
    leaves are per-row digests laid out in `order_col` order (indexed
    by aggregate.dense_index — the two-level scan, no global window);
    each upper level pairs children idx 2i / 2i+1 with one shifted
    equi-join per round — digest = md5(left || right), a lone
    trailing child hashing as md5(left || '') — so the build is
    O(log n) rounds, each half the size. Returns every tree node as
    (level, idx, digest); the root is the single row at the top
    level."""
    from .aggregate import dense_index

    level = dense_index(
        df.select(F.col(order_col).alias("_k"),
                  leaf_digest.alias("digest")),
        "_k", out="idx").select("idx", "digest")         .localCheckpoint(eager=False)
    n = level.count()
    out = level.withColumn("level", F.lit(0).cast("long"))
    lvl = 0
    while n > 1 and lvl < max_levels:
        left = level.where(F.col("idx") % 2 == 0).select(
            (F.col("idx") / 2).cast("long").alias("idx"),
            F.col("digest").alias("dl"))
        right = level.where(F.col("idx") % 2 == 1).select(
            (F.col("idx") / 2).cast("long").alias("idx"),
            F.col("digest").alias("dr"))
        level = (left.join(right, "idx", "left")
                 .select("idx",
                         F.md5(F.concat(F.col("dl"),
                                        F.coalesce(F.col("dr"),
                                                   F.lit(""))))
                         .alias("digest"))
                 .localCheckpoint(eager=False))
        lvl += 1
        n = level.count()
        out = out.unionByName(
            level.withColumn("level", F.lit(lvl).cast("long")))
    return out.select("level", "idx", "digest")
