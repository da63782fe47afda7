"""CDC operators (operators/cdc.py): snapshot diff + SCD2 history."""

from pyspark.sql import functions as F

from bdtopo2refhydro_spark.operators.cdc import scd2_build, snapshot_diff


def test_snapshot_diff_classifies_all_change_kinds(spark):
    old = spark.createDataFrame(
        [(1, "alpha", "en"), (2, "beta", "en"), (3, "gamma", "fr")],
        "doc_id long, text string, lang string")
    new = spark.createDataFrame(
        [(1, "alpha", "en"),        # unchanged
         (2, "beta EDITED", "en"),  # changed
         (4, "delta", "de")],       # added; 3 removed
        "doc_id long, text string, lang string")
    got = {r.doc_id: r.change
           for r in snapshot_diff(old, new, "doc_id",
                                  ["text", "lang"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}

    with_unchanged = {r.doc_id: r.change
                      for r in snapshot_diff(old, new, "doc_id",
                                             ["text", "lang"],
                                             include_unchanged=True)
                      .collect()}
    assert with_unchanged[1] == "unchanged" and len(with_unchanged) == 4


def test_snapshot_diff_null_vs_empty_and_separator_injection(spark):
    """NULL and '' must digest differently, and column-boundary drift
    ('ab','c') vs ('a','bc') must not collide."""
    old = spark.createDataFrame([(1, None, "x"), (2, "ab", "c")],
                                "k long, a string, b string")
    new = spark.createDataFrame([(1, "", "x"), (2, "a", "bc")],
                                "k long, a string, b string")
    got = {r.k: r.change
           for r in snapshot_diff(old, new, "k", ["a", "b"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_scd2_collapses_runs_and_builds_validity_ranges(spark):
    ev = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", 0, "trial"),
         (7, "2024-01-02 00:00:00", 1, "trial"),     # same value: collapses
         (7, "2024-01-03 00:00:00", 2, "paid"),
         (7, "2024-01-05 00:00:00", 3, "churned"),
         (8, "2024-06-01 00:00:00", 4, "paid")],
        "user_id long, ts_s string, event_id long, plan string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_id", "plan")
    rows = scd2_build(ev, "user_id", "ts", "plan",
                      tiebreak_col="event_id").collect()
    by_key = {(r.user_id, r.plan): (r.valid_from_us, r.valid_to_us,
                                    r.is_current) for r in rows}
    us = lambda s: int(  # noqa: E731
        __import__("datetime").datetime.fromisoformat(s + "+00:00")
        .timestamp() * 1_000_000)
    assert len(rows) == 4  # the duplicate 'trial' produced no version
    assert by_key[(7, "trial")] == (
        us("2024-01-01 00:00:00"), us("2024-01-03 00:00:00"), False)
    assert by_key[(7, "paid")] == (
        us("2024-01-03 00:00:00"), us("2024-01-05 00:00:00"), False)
    assert by_key[(7, "churned")] == (
        us("2024-01-05 00:00:00"), None, True)
    assert by_key[(8, "paid")] == (us("2024-06-01 00:00:00"), None, True)


def test_scd2_equal_timestamps_break_ties_deterministically(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 2, "b"),
         (1, "2024-01-01 00:00:00", 1, "a")],   # same ts: event_id orders
        "user_id long, ts_s string, event_id long, plan string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_id", "plan")
    rows = sorted(scd2_build(ev, "user_id", "ts", "plan",
                             tiebreak_col="event_id").collect(),
                  key=lambda r: r.valid_from_us == r.valid_from_us
                  and not r.is_current, reverse=True)
    assert [r.plan for r in rows] == ["a", "b"]
    assert rows[0].is_current is False and rows[1].is_current is True
    # zero-length validity: both versions share valid_from == valid_to
    assert rows[0].valid_to_us == rows[1].valid_from_us


def test_refresh_pipeline_outcome_partition(spark):
    """The four outcome counts must partition the candidate set with
    exact precedence: exact-dup > near-dup > token gate > admitted."""
    from bdtopo2refhydro_spark.plans.refresh import run_refresh_pipeline

    base = ("the quick brown fox jumps over the lazy dog near the wide "
            "river bank today")
    old = spark.createDataFrame(
        [(0, base, "en", "h1"),
         (2, "some other old corpus page body entirely", "en", "h1")],
        "doc_id long, text string, lang string, source string")
    new = spark.createDataFrame(
        [(0, base, "en", "h1"),                      # unchanged → NOT a candidate
         (2, base + " appended", "en", "h1"),        # changed + near-dup of 0
         (5, "some other old corpus page body entirely", "en", "h1"),
         # added + exact-dup of old 2 ↑
         (6, "tiny", "en", "h1"),                    # added, fails ≥4 gate
         (7, "a genuinely fresh page with plenty of new words", "en", "h1")],
        "doc_id long, text string, lang string, source string")
    [r] = run_refresh_pipeline(old, new, threshold=0.5,
                               min_tokens=4).collect()
    assert (r.source, r.n_candidates) == ("h1", 4)   # doc 0 not a candidate
    assert (r.n_exact, r.n_near, r.n_gate_failed, r.n_admitted) == \
        (1, 1, 1, 1)
    assert r.tok_admitted == 9


def test_entity_clusters_transitive_multi_key(spark):
    from bdtopo2refhydro_spark.operators.cdc import entity_clusters

    # A-B share email, B-C share phone, D isolated, E-F share phone
    rows = [
        (1, "a@x", "p1"), (2, "a@x", "p2"), (3, "b@x", "p2"),
        (4, "c@x", "p9"), (5, "d@x", "p5"), (6, "e@x", "p5"),
        (7, None, None),
    ]
    df = spark.createDataFrame(rows, "rid long, em string, ph string")
    got = {r["rid"]: r["cluster"]
           for r in entity_clusters(df, "rid", ["em", "ph"]).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}
