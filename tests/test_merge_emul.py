"""merge_apply: every MERGE branch + source dedupe pinned."""

from bdtopo2refhydro_spark.operators.relational import merge_apply


def test_merge_apply_all_branches(spark):
    target = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 100), (3, 30, 100)],
        "k long, val long, ts long")
    source = spark.createDataFrame(
        [(2, 99, 200, "upsert"),     # matched update
         (3, 0, 200, "delete"),      # matched delete
         (4, 44, 200, "upsert"),     # insert
         (5, 55, 200, "delete"),     # unmatched delete -> no-op
         (6, 66, 150, "upsert"),     # dup key: lower ts loses
         (6, 61, 300, "upsert")],
        "k long, val long, ts long, op string")
    got = {r["k"]: (r["val"], r["ts"])
           for r in merge_apply(target, source).collect()}
    assert got == {
        1: (10, 100),   # passthrough
        2: (99, 200),   # updated
        4: (44, 200),   # inserted
        6: (61, 300),   # deduped to max-ts source row
    }
