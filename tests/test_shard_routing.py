"""hrw_assign / ring_assign: minimal movement, balance, wraparound."""

from pyspark.sql import functions as F

from bdtopo2refhydro_spark.operators.corpus import hrw_assign, ring_assign


def test_hrw_minimal_movement_and_balance(spark):
    keys = spark.range(2000).select(F.col("id").alias("k"))
    a = {r["k"]: r["node"] for r in hrw_assign(keys, 8).collect()}
    b = {r["k"]: r["node"] for r in hrw_assign(keys, 9).collect()}
    moved = [k for k in a if a[k] != b[k]]
    assert moved and all(b[k] == 8 for k in moved)  # only to the new node
    from collections import Counter
    loads = Counter(a.values())
    assert len(loads) == 8
    assert max(loads.values()) < 3 * min(loads.values())  # no collapse


def test_hrw_assign_plan_is_zero_shuffle(spark):
    keys = spark.range(100).select(F.col("id").alias("k"))
    plan = hrw_assign(keys, 10)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_ring_assign_covers_all_nodes_and_is_deterministic(spark):
    keys = spark.range(1500).select(F.col("id").alias("k"))
    got1 = {r["k"]: r["node"] for r in ring_assign(keys, 6).collect()}
    got2 = {r["k"]: r["node"]
            for r in ring_assign(keys.repartition(13), 6).collect()}
    assert got1 == got2  # partition-order independent
    assert set(got1.values()) == set(range(6))
