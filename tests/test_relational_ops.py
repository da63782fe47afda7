"""Correction-pass operators (SURVEY.md §2.2-§2.3) on tiny tables."""

import pytest
from pyspark.sql import functions as F

from bdtopo2refhydro_spark.geom.wkb import linestring_wkb, parse_wkb
from bdtopo2refhydro_spark.operators import (
    append_skip_duplicates,
    dedup_geometries,
    filter_canals,
    fix_connection,
    fix_connection_and_direction,
    fix_direction,
    fix_modified_geom,
    fix_suppr_canal_multichenal,
    merge_layers,
    take_first_join,
)

L1 = linestring_wkb([[0, 0], [1, 1]])
L2 = linestring_wkb([[2, 2], [3, 3]])
L3 = linestring_wkb([[4, 4], [5, 5]])


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [("u1", L1, "Ecoulement naturel"),
         ("u2", L2, "Canal"),
         ("u3", L1, "Conduit forcé"),
         ("u4", L3, "Ecoulement naturel")],
        "url string, geom_wkb binary, nature string",
    )


def test_dedup_geometries_keeps_first(target):
    out = dedup_geometries(target)
    urls = {r.url for r in out.collect()}
    assert urls == {"u1", "u2", "u4"}  # u3 shares L1 with u1; u1 < u3


def test_fix_connection_inserts_only_missing(spark, target):
    corr = spark.createDataFrame(
        [("u2", L3), ("u9", L3)], "url string, geom_wkb binary"
    )
    out = fix_connection(target, corr)
    assert out.count() == 5
    assert out.filter("url = 'u9'").count() == 1
    assert out.filter("url = 'u2'").count() == 1  # not duplicated


def test_fix_connection_never_broadcasts_target(spark, target):
    """Plan guard (VERDICT r1 #1): the anti-join that filters incoming
    corrections must not broadcast-build on the TARGET's key set — at
    corpus scale that key set is billions of rows and the hint would
    collect it to the driver. With both inputs tiny AQE may still *choose*
    a broadcast at runtime; what we assert is that no broadcast HINT is
    planned on the target side (ResolvedHint in the analyzed plan)."""
    corr = spark.createDataFrame(
        [("u2", L3), ("u9", L3)], "url string, geom_wkb binary"
    )
    out = fix_connection(target, corr)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    # and the result is still correct
    assert out.count() == 5


def test_fix_direction_reverses_only_keyed(spark, target):
    corr = spark.createDataFrame([("u1",)], "url string")
    out = {r.url: r.geom_wkb for r in fix_direction(target, corr).collect()}
    _, rev = parse_wkb(bytes(out["u1"]))
    assert rev[0].tolist() == [1, 1] and rev[-1].tolist() == [0, 0]
    assert bytes(out["u2"]) == L2  # untouched


def test_fix_connection_and_direction(spark, target):
    corr = spark.createDataFrame(
        [("u9", L1), ("u4", None)], "url string, geom_wkb binary"
    )
    out = fix_connection_and_direction(target, corr)
    rows = {r.url: r.geom_wkb for r in out.collect()}
    assert len(rows) == 5
    _, g9 = parse_wkb(bytes(rows["u9"]))
    assert g9[0].tolist() == [1, 1]  # inserted AND reversed
    _, g4 = parse_wkb(bytes(rows["u4"]))
    assert g4[0].tolist() == [5, 5]  # reversed in place


def test_fix_modified_geom(spark, target):
    corr = spark.createDataFrame(
        [("u2", L3)], "url string, new_geom_wkb binary"
    )
    out = {r.url: bytes(r.geom_wkb) for r in fix_modified_geom(target, corr).collect()}
    assert out["u2"] == L3
    assert out["u1"] == L1


def test_fix_suppr_canal_multichenal(spark, target):
    corr = spark.createDataFrame([("u2",), ("u3",)], "url string")
    out = fix_suppr_canal_multichenal(target, corr)
    assert {r.url for r in out.collect()} == {"u1", "u4"}


def test_filter_canals(target):
    out = filter_canals(target)
    assert {r.url for r in out.collect()} == {"u1", "u4"}


def test_merge_layers_adds_provenance(spark):
    a = spark.createDataFrame([("u1", 1)], "url string, x int")
    b = spark.createDataFrame([("u2", 2.0)], "url string, y double")
    out = merge_layers([("la", a), ("lb", b)])
    rows = {r.url: r for r in out.collect()}
    assert rows["u1"].layer == "la" and rows["u2"].layer == "lb"
    assert rows["u1"].y is None and rows["u2"].x is None


def test_take_first_join(spark):
    left = spark.createDataFrame([("k1", 10)], "k string, v int")
    right = spark.createDataFrame(
        [("k1", "b", 2), ("k1", "a", 1), ("k2", "c", 3)],
        "k string, name string, ord int",
    )
    out = take_first_join(left, right, "k", F.col("ord")).collect()
    assert len(out) == 1
    assert out[0].join_name == "a"  # lowest ord wins


def test_append_skip_duplicates(spark):
    base = spark.createDataFrame([("u1", 1)], "url string, v int")
    inc = spark.createDataFrame([("u1", 99), ("u2", 2)], "url string, v int")
    out = append_skip_duplicates(base, inc)
    rows = {r.url: r.v for r in out.collect()}
    assert rows == {"u1": 1, "u2": 2}


def test_salted_join_equals_plain_join_on_skewed_keys(spark):
    from bdtopo2refhydro_spark.operators.relational import salted_join

    # 997 rows on key 1 (the hot head), a few on 2/3, one dangling dim key
    rows = [(i, 1 if i < 997 else (2 if i % 2 == 0 else 3), f"p{i}")
            for i in range(1000)]
    skewed = spark.createDataFrame(rows, "row_id long, k long, payload string")
    dim = spark.createDataFrame([(1, "hot"), (2, "warm"), (9, "unused")],
                                "k long, label string")
    got = salted_join(skewed, dim, "k", salts=8).collect()
    want = skewed.join(dim, "k").collect()
    key = lambda r: (r.row_id, r.k, r.payload, r.label)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))

    left_got = salted_join(skewed, dim, "k", salts=8, how="left").collect()
    left_want = skewed.join(dim, "k", "left").collect()
    lkey = lambda r: (r.row_id, r.k, r.payload, r.label)  # noqa: E731
    assert sorted(map(lkey, left_got)) == sorted(map(lkey, left_want))


def test_salted_join_spreads_hot_key_and_is_deterministic(spark):
    from bdtopo2refhydro_spark.operators.relational import salted_join

    skewed = spark.createDataFrame(
        [(i, 1, f"p{i}") for i in range(512)],
        "row_id long, k long, payload string")
    dim = spark.createDataFrame([(1, "hot")], "k long, label string")
    out = salted_join(skewed, dim, "k", salts=8)
    # the hot key's rows really occupy many (key, salt) buckets
    n_buckets = (
        skewed.withColumn(
            "_salt",
            __import__("pyspark.sql.functions", fromlist=["pmod"]).pmod(
                __import__("pyspark.sql.functions",
                           fromlist=["xxhash64"]).xxhash64("row_id",
                                                           "payload"), 8))
        .select("_salt").distinct().count())
    assert n_buckets == 8
    # physical join keys include the salt; the dim side replicates via
    # an explode (Generate) — the shape that actually spreads the work
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan and "Generate explode" in plan
    # deterministic salting: two runs place rows identically
    assert sorted(r.row_id for r in out.collect()) == list(range(512))
