"""Data-quality operators (operators/dq.py)."""

from bdtopo2refhydro_spark.operators.dq import (
    check_constraints,
    check_unique,
    profile_columns,
)


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")],
        "id long, v string")
    got = {r.column: (r.n, r.n_null, r.n_distinct, r.min_str, r.max_str)
           for r in profile_columns(df).collect()}
    assert got["id"] == (4, 0, 4, "1", "4")
    assert got["v"] == (4, 1, 2, "a", "b")


def test_profile_columns_lexicographic_minmax_documented(spark):
    # 10 < 9 lexicographically — the profile is on the STRING form by
    # contract (both engines codepoint-order), not numeric order
    df = spark.createDataFrame([(10,), (9,)], "x long")
    [r] = profile_columns(df, ["x"]).collect()
    assert (r.min_str, r.max_str) == ("10", "9")


def test_check_constraints_single_pass_and_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, "en", 5), (2, "xx", -3), (3, None, 7)],
        "id long, lang string, n long")
    got = {r.rule: (r.n_checked, r.n_violations, r.passed)
           for r in check_constraints(df, [
               ("lang_known", "lang in ('en','fr','de')"),
               ("n_nonneg", "n >= 0"),
               ("id_notnull", "id is not null"),
           ]).collect()}
    # 'xx' fails; NULL lang is also a violation (unknown != ok)
    assert got["lang_known"] == (3, 2, False)
    assert got["n_nonneg"] == (3, 1, False)
    assert got["id_notnull"] == (3, 0, True)


def test_check_unique_counts_extra_copies(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "z"), (2, "w")], "k long, p string")
    [r] = check_unique(df, ["k"]).collect()
    assert (r.rule, r.n_checked, r.n_violations, r.passed) == \
        ("unique:k", 4, 2, False)

    [ok] = check_unique(df, ["k", "p"]).collect()
    assert ok.passed is True and ok.n_violations == 0
