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


def linreg_groups(df: DataFrame, group_col: str = "g",
                  x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per-group ordinary least squares over integer samples, exact to
    the bit: one aggregation collects (n, Σx, Σy, Σxy, Σx²) as BIGINTs,
    then

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)          = N / D
        intercept = (Σy·D − Σx·N) / (n·D)

    each a SINGLE IEEE division of exact integers — no float
    accumulation anywhere, so results replay bit-identically on any
    engine/partitioning. One map-side-combined shuffle of 5 longs per
    group; nothing else moves."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count("*").alias("n"), F.sum(x).alias("sx"),
        F.sum(y).alias("sy"), F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"))
    N = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    D = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "g", F.col("n").cast("long").alias("n"),
        (N.cast("double") / D.cast("double")).alias("slope"),
        ((F.col("sy") * D - F.col("sx") * N).cast("double")
         / (F.col("n") * D).cast("double")).alias("intercept"))


def batch_perceptron(df: DataFrame, feature_cols: list[str],
                     label_col: str = "y", rounds: int = 3) -> DataFrame:
    """Batch (gradient-style) perceptron over integer features: per
    round, w += Σ_misclassified y·(1, x…) — the whole update is ONE
    map-side-combined aggregation, so every round is a scan + a
    k+1-long shuffle row, never a parameter server. y ∈ {−1, +1};
    margin ≤ 0 counts as misclassified (so round 1 from w = 0 updates
    on every row). Weights stay a broadcast 1-row DataFrame end to
    end — integer-exact, order-independent, bit-replayable.

    Returns one row: (w0, w1…wk, n_mis) with n_mis evaluated at the
    final weights."""
    k = len(feature_cols)
    ws = ["w0"] + [f"w{i + 1}" for i in range(k)]
    w = df.sparkSession.createDataFrame(
        [tuple([0] * (k + 1))], ", ".join(f"{c} long" for c in ws))
    y = F.col(label_col).cast("long")
    feats = [F.lit(1).cast("long")] + [
        F.col(c).cast("long") for c in feature_cols]

    def margin():
        return y * sum(
            (F.col(ws[i]) * feats[i] for i in range(k + 1)),
            start=F.lit(0).cast("long"))

    for _ in range(rounds):
        joined = df.crossJoin(F.broadcast(w))
        mis = joined.filter(margin() <= 0)
        delta = mis.agg(*[
            F.coalesce(F.sum(y * feats[i]), F.lit(0)).cast("long")
            .alias(f"d{i}") for i in range(k + 1)])
        w = (w.crossJoin(F.broadcast(delta))
             .select(*[(F.col(ws[i]) + F.col(f"d{i}")).alias(ws[i])
                       for i in range(k + 1)]))
        w = w.localCheckpoint(eager=False)
    n_mis = (df.crossJoin(F.broadcast(w)).filter(margin() <= 0)
             .agg(F.count("*").cast("long").alias("n_mis")))
    return w.crossJoin(F.broadcast(n_mis))


def nb_train_predict(train_tokens: DataFrame, probes: DataFrame,
                     vocab_size: int, label_col: str = "label",
                     token_col: str = "token", pid_col: str = "pid",
                     tokens_col: str = "toks") -> DataFrame:
    """Binary multinomial naive Bayes, trained and served in one plan,
    argmax EXACT: with Laplace smoothing the class scores are
    rationals, so instead of comparing float log-likelihoods the
    cross-multiplied integer comparison

        N1·Πⱼ(cnt(tⱼ,1)+1)·(N0+V)^k  >  N0·Πⱼ(cnt(tⱼ,0)+1)·(N1+V)^k

    decides the class with NO rounding anywhere (ties → class 0).
    Products of the small per-token counts are exact in double
    (< 2^53) and the final comparison runs in decimal(38,0), so ANSI
    never overflows. Training is one groupBy over the token stream;
    the count table broadcasts to the probe side (model ≪ corpus — the
    usual 100 TB shape). Probe token arrays must have fixed length k
    per row (k = size(toks), used as the smoothing exponent).

    Returns (pid, p1, p0, pred): the smoothed-count products per class
    and the predicted label."""
    lab = F.col(label_col).cast("long")
    counts = train_tokens.groupBy(F.col(token_col).alias("t")).agg(
        F.sum(F.when(lab == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(lab == 0, 1).otherwise(0)).alias("c0"))
    totals = train_tokens.agg(
        F.sum(F.when(lab == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(lab == 0, 1).otherwise(0)).cast("long").alias("n0"))
    ex = probes.select(F.col(pid_col).alias("pid"),
                       F.explode(tokens_col).alias("t"))
    joined = ex.join(F.broadcast(counts), "t", "left")
    per = joined.groupBy("pid").agg(
        F.product(F.coalesce("c1", F.lit(0)) + 1).alias("p1"),
        F.product(F.coalesce("c0", F.lit(0)) + 1).alias("p0"),
        F.count("*").alias("k"))
    dec = "decimal(38,0)"
    v = F.lit(int(vocab_size))
    s1 = (F.col("n1").cast(dec) * F.col("p1").cast(dec)
          * F.pow(F.col("n0") + v, F.col("k")).cast(dec))
    s0 = (F.col("n0").cast(dec) * F.col("p0").cast(dec)
          * F.pow(F.col("n1") + v, F.col("k")).cast(dec))
    return (per.crossJoin(F.broadcast(totals))
            .select("pid", F.col("p1").cast("long").alias("p1"),
                    F.col("p0").cast("long").alias("p0"),
                    F.when(s1 > s0, 1).otherwise(0)
                    .cast("long").alias("pred")))


def blocked_matmul(a: DataFrame, b: DataFrame, *, block: int = 4
                   ) -> DataFrame:
    """Sparse integer matrix multiply C = A·B in BLOCK form — the
    communication-optimal distributed matmul, not the naive cell
    join: cells are grouped into block×block tiles, tile pairs
    (A[bi,bk], B[bk,bj]) meet in ONE equi-join on the inner block
    index, each pair is multiplied densely in numpy inside
    mapInPandas (Arrow-batched, no per-cell Python), and partial
    tiles sum cell-wise in a final groupBy. Shuffled bytes scale with
    tiles, not with cell-pair matches — at 100 TB the tile size is
    the knob that trades replication against partial-sum traffic.

    `a` has columns (i, k, v); `b` has (k, j, v); values must be
    non-negative integers (zero partial products are dropped, which
    is lossless because nothing can cancel). Returns (i, j, v) with
    v = Σ_k a[i,k]·b[k,j] over the joined support, exactly the SQL
    join-aggregate."""
    import pandas as pd

    ab = (a.withColumn("bi", (F.col("i") / block).cast("long"))
          .withColumn("bk", (F.col("k") / block).cast("long"))
          .groupBy("bi", "bk")
          .agg(F.collect_list(F.struct("i", "k", "v")).alias("ac")))
    bb = (b.withColumn("bk", (F.col("k") / block).cast("long"))
          .withColumn("bj", (F.col("j") / block).cast("long"))
          .groupBy("bk", "bj")
          .agg(F.collect_list(F.struct("k", "j", "v")).alias("bc")))
    pairs = ab.join(bb, "bk").select("bi", "bj", "ac", "bc")

    def mult(batches):
        import numpy as np

        for pdf in batches:
            out_i, out_j, out_v = [], [], []
            for _, row in pdf.iterrows():
                acells = row["ac"]
                bcells = row["bc"]
                ai = np.array([c["i"] for c in acells])
                ak = np.array([c["k"] for c in acells])
                av = np.array([c["v"] for c in acells])
                bk_ = np.array([c["k"] for c in bcells])
                bj_ = np.array([c["j"] for c in bcells])
                bv = np.array([c["v"] for c in bcells])
                i0, i1 = ai.min(), ai.max()
                k0 = min(ak.min(), bk_.min())
                k1 = max(ak.max(), bk_.max())
                j0, j1 = bj_.min(), bj_.max()
                A = np.zeros((i1 - i0 + 1, k1 - k0 + 1), dtype=np.int64)
                B = np.zeros((k1 - k0 + 1, j1 - j0 + 1), dtype=np.int64)
                A[ai - i0, ak - k0] = av
                B[bk_ - k0, bj_ - j0] = bv
                C = A @ B
                nz = np.nonzero(C)
                out_i.append(nz[0] + i0)
                out_j.append(nz[1] + j0)
                out_v.append(C[nz])
            if out_i:
                yield pd.DataFrame({
                    "i": np.concatenate(out_i),
                    "j": np.concatenate(out_j),
                    "pv": np.concatenate(out_v)})

    partial = pairs.mapInPandas(mult, "i long, j long, pv long")
    return partial.groupBy("i", "j").agg(F.sum("pv").alias("v"))


def lis_lengths(seq: DataFrame, *, g: str = "g", idx: str = "i",
                val: str = "a") -> DataFrame:
    """Longest strictly-increasing subsequence length per group by
    PATIENCE SORTING (the O(n log n) bisect-on-tails algorithm — the
    real one, not the quadratic DP the oracle uses): per-group Arrow
    scan, sequences ordered by `idx`. Returns (g, lis)."""
    import bisect

    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gv, grp in pdf.groupby(g, sort=False):
            grp = grp.sort_values(idx)
            tails: list = []
            for a in grp[val]:
                pos = bisect.bisect_left(tails, a)
                if pos == len(tails):
                    tails.append(a)
                else:
                    tails[pos] = a
            out.append((gv, len(tails)))
        return pd.DataFrame(out, columns=[g, "lis"])

    return (seq.select(F.col(g), F.col(idx), F.col(val))
            .groupBy(g)
            .applyInPandas(lambda pdf: run(pdf), f"{g} long, lis long"))


def knapsack01(items: DataFrame, cap: int, *, g: str = "g",
               wt: str = "wt", val: str = "val") -> DataFrame:
    """0/1 knapsack optimum per group by the REAL O(n·W) DP (1-D
    array, descending weight scan) — per-group Arrow UDF; the oracle
    brute-forces all 2ⁿ subsets. Integer weights/values. Returns
    (g, best)."""
    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gv, grp in pdf.groupby(g, sort=False):
            dp = [0] * (cap + 1)
            for w_, v_ in zip(grp[wt], grp[val]):
                if w_ > cap:
                    continue
                for c in range(cap, w_ - 1, -1):
                    cand = dp[c - w_] + v_
                    if cand > dp[c]:
                        dp[c] = cand
            out.append((gv, dp[cap]))
        return pd.DataFrame(out, columns=[g, "best"])

    return (items.select(F.col(g), F.col(wt), F.col(val))
            .groupBy(g)
            .applyInPandas(lambda pdf: run(pdf), f"{g} long, best long"))


def weighted_interval_max(iv: DataFrame, *, g: str = "g", s: str = "s",
                          e: str = "e", val: str = "val") -> DataFrame:
    """Weighted interval scheduling optimum per group by the REAL
    O(n log n) DP: sort by end, dp[i] = max(dp[i−1], val_i +
    dp[pred(i)]) with pred found by bisect on end times — vs the
    oracle's max-weight compatible-chain recursion. Touching
    intervals (s == e) are compatible. Returns (g, best)."""
    import bisect

    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gv, grp in pdf.groupby(g, sort=False):
            rows = sorted(zip(grp[e], grp[s], grp[val]))
            ends = [r[0] for r in rows]
            dp = [0] * (len(rows) + 1)
            for i, (e_, s_, v_) in enumerate(rows, 1):
                p = bisect.bisect_right(ends, s_, 0, i - 1)
                dp[i] = max(dp[i - 1], v_ + dp[p])
            out.append((gv, dp[len(rows)]))
        return pd.DataFrame(out, columns=[g, "best"])

    return (iv.select(F.col(g), F.col(s), F.col(e), F.col(val))
            .groupBy(g)
            .applyInPandas(lambda pdf: run(pdf), f"{g} long, best long"))


def det_bareiss(cells: DataFrame, n: int | None = None, *,
                g: str = "g", i: str = "i", j: str = "j",
                v: str = "v") -> DataFrame:
    """Exact integer determinant per group by the BAREISS
    fraction-free elimination — every division in the recurrence
    M[i][j] ← (M[i][j]·M[k][k] − M[i][k]·M[k][j]) / prev is exact
    over the integers (Sylvester's identity), with partial pivoting
    (row swap flips the sign) for zero pivots. Python bignum
    arithmetic per group, so no overflow at any size. `cells` is the
    dense (g, i, j, v) matrix; n=None infers each group's size as
    max(i)+1. Returns (g, det)."""
    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gv, grp in pdf.groupby(g, sort=False):
            nn = n if n is not None else int(grp[i].max()) + 1
            m = [[0] * nn for _ in range(nn)]
            for ii, jj, vv in zip(grp[i], grp[j], grp[v]):
                m[int(ii)][int(jj)] = int(vv)
            sign, prev, det = 1, 1, None
            for k in range(nn - 1):
                if m[k][k] == 0:
                    for r in range(k + 1, nn):
                        if m[r][k] != 0:
                            m[k], m[r] = m[r], m[k]
                            sign = -sign
                            break
                    else:
                        det = 0
                        break
                for r in range(k + 1, nn):
                    for c in range(k + 1, nn):
                        m[r][c] = (m[r][c] * m[k][k]
                                   - m[r][k] * m[k][c]) // prev
                    m[r][k] = 0
                prev = m[k][k]
            if det is None:
                det = sign * m[nn - 1][nn - 1]
            out.append((gv, det))
        return pd.DataFrame(out, columns=[g, "det"])

    return (cells.select(F.col(g), F.col(i), F.col(j), F.col(v))
            .groupBy(g)
            .applyInPandas(lambda pdf: run(pdf), f"{g} long, det long"))


def inversion_counts(seq: DataFrame, *, g: str = "g", idx: str = "i",
                     val: str = "a") -> DataFrame:
    """Inversion count per group by MERGE-SORT counting (the real
    O(n log n) divide-and-conquer — cross-inversions tallied during
    each merge) vs the oracle's O(n²) pair join. Returns (g, inv)."""
    import pandas as pd

    def count(arr):
        if len(arr) <= 1:
            return arr, 0
        mid = len(arr) // 2
        l, il = count(arr[:mid])
        r, ir = count(arr[mid:])
        out, inv, i2, j2 = [], il + ir, 0, 0
        while i2 < len(l) and j2 < len(r):
            if l[i2] <= r[j2]:
                out.append(l[i2])
                i2 += 1
            else:
                out.append(r[j2])
                j2 += 1
                inv += len(l) - i2
        out.extend(l[i2:])
        out.extend(r[j2:])
        return out, inv

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gv, grp in pdf.groupby(g, sort=False):
            arr = list(grp.sort_values(idx)[val])
            _, inv = count(arr)
            out.append((gv, inv))
        return pd.DataFrame(out, columns=[g, "inv"])

    return (seq.select(F.col(g), F.col(idx), F.col(val))
            .groupBy(g)
            .applyInPandas(lambda pdf: run(pdf), f"{g} long, inv long"))


def huffman_cost(freqs: DataFrame, *, g: str = "g",
                 f: str = "f") -> DataFrame:
    """Optimal prefix-code cost per group by the REAL Huffman
    heap-merge (total cost = Σ internal-node sums = Σ fᵢ·depthᵢ);
    verified against an independent characterization: the minimum
    over all Kraft-tight depth multisets with the rearrangement-
    optimal frequency pairing. Returns (g, cost)."""
    import heapq

    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gv, grp in pdf.groupby(g, sort=False):
            h = sorted(int(x) for x in grp[f])
            heapq.heapify(h)
            cost = 0
            while len(h) > 1:
                a = heapq.heappop(h)
                b = heapq.heappop(h)
                cost += a + b
                heapq.heappush(h, a + b)
            out.append((gv, cost))
        return pd.DataFrame(out, columns=[g, "cost"])

    return (freqs.select(F.col(g), F.col(f))
            .groupBy(g)
            .applyInPandas(lambda pdf: run(pdf), f"{g} long, cost long"))


def isotonic_fit(seq: DataFrame, *, g: str = "g", idx: str = "i",
                 val: str = "a") -> DataFrame:
    """Isotonic (monotone non-decreasing) regression per group by
    POOL-ADJACENT-VIOLATORS — the real stack-based linear pooling —
    emitting each point's fitted value as ONE IEEE division of the
    pooled block's exact integer (sum, count). The oracle instead
    evaluates the MINIMAX characterization fitted_i = max_{j≤i}
    min_{k≥i} mean(a[j..k]): a different (s, c) pair for the same
    rational, but correctly-rounded division makes equal rationals
    equal doubles, so the columns hash identically. Returns
    (g, i, fit)."""
    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gv, grp in pdf.groupby(g, sort=False):
            grp = grp.sort_values(idx)
            blocks: list = []  # (sum, cnt)
            for a in grp[val]:
                s, c = int(a), 1
                while blocks and blocks[-1][0] * c >= s * blocks[-1][1]:
                    ps, pc = blocks.pop()
                    s += ps
                    c += pc
                blocks.append((s, c))
            fits = []
            for s, c in blocks:
                fits.extend([s / c] * c)
            for i, f_ in zip(grp[idx], fits):
                out.append((gv, int(i), f_))
        return pd.DataFrame(out, columns=[g, idx, "fit"])

    return (seq.select(F.col(g), F.col(idx), F.col(val))
            .groupBy(g)
            .applyInPandas(lambda pdf: run(pdf),
                           f"{g} long, {idx} long, fit double"))


def lp2_simplex(constraints: DataFrame, objectives: DataFrame, *,
                g: str = "g") -> DataFrame:
    """2-variable LP max px+qy s.t. aᵢx+bᵢy ≤ cᵢ, x,y ≥ 0 — solved
    per group by a REAL simplex (standard tableau over exact
    FRACTIONS, Bland's rule, slack basis). The optimum emitted as one
    correctly-rounded division of the exact rational, so the oracle's
    vertex-enumeration route (Cramer determinants + sign-aware
    cross-multiplied feasibility) lands on the identical double.
    constraints: (g, a, b, c); objectives: (g, p, q). Returns
    (g, obj)."""
    from fractions import Fraction

    import pandas as pd

    def solve(rows, p, q):
        m = len(rows)
        # tableau: maximize px+qy; columns x, y, s1..sm | rhs
        T = [[Fraction(0)] * (2 + m + 1) for _ in range(m + 1)]
        for i, (a, b, c) in enumerate(rows):
            T[i][0], T[i][1] = Fraction(a), Fraction(b)
            T[i][2 + i] = Fraction(1)
            T[i][-1] = Fraction(c)
        T[m][0], T[m][1] = Fraction(-p), Fraction(-q)
        basis = [2 + i for i in range(m)]
        while True:
            # Bland: first negative reduced cost
            piv_c = next((j for j in range(2 + m)
                          if T[m][j] < 0), None)
            if piv_c is None:
                break
            # min ratio, Bland tie-break by basis index
            best, piv_r = None, None
            for i in range(m):
                if T[i][piv_c] > 0:
                    r = T[i][-1] / T[i][piv_c]
                    if best is None or r < best or \
                            (r == best and basis[i] < basis[piv_r]):
                        best, piv_r = r, i
            if piv_r is None:
                raise ValueError("unbounded LP in fixture")
            pv = T[piv_r][piv_c]
            T[piv_r] = [x / pv for x in T[piv_r]]
            for i in range(m + 1):
                if i != piv_r and T[i][piv_c] != 0:
                    f_ = T[i][piv_c]
                    T[i] = [x - f_ * y
                            for x, y in zip(T[i], T[piv_r])]
            basis[piv_r] = piv_c
        val = T[m][-1]
        return val.numerator / val.denominator

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gv, grp in pdf.groupby(g, sort=False):
            rows = sorted(zip(grp["a"], grp["b"], grp["c"]))
            p, q = int(grp["p"].iloc[0]), int(grp["q"].iloc[0])
            out.append((gv, solve([(int(a), int(b), int(c))
                                   for a, b, c in rows], p, q)))
        return pd.DataFrame(out, columns=[g, "obj"])

    joined = constraints.join(objectives, g)
    return (joined.groupBy(g)
            .applyInPandas(run, f"{g} long, obj double"))
