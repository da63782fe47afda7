"""pdrange python DataSource: filter pushdown narrows partition
planning; unsupported filters still applied by Spark."""

import pytest

from bdtopo2refhydro_spark.sources.pushdown import register_pdrange_source


@pytest.fixture()
def pd_spark(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    assert register_pdrange_source(spark)
    return spark


def _load(spark):
    return (spark.read.format("pdrange").option("n", 5000)
            .option("rows_per_part", 50).load())


def test_pushdown_prunes_partitions(pd_spark):
    df = _load(pd_spark).filter("id >= 100 and id <= 249")
    assert df.rdd.getNumPartitions() == 3  # 150 rows / 50, not 100
    ids = sorted(r["id"] for r in df.collect())
    assert ids == list(range(100, 250))


def test_unsupported_filter_reapplied_by_spark(pd_spark):
    df = _load(pd_spark).filter("id >= 10 and id <= 29 and val > 50")
    rows = {(r["id"], r["val"]) for r in df.collect()}
    assert rows == {(i, (i * i) % 97) for i in range(10, 30)
                    if (i * i) % 97 > 50}
    assert rows  # non-empty


def test_equality_pushdown_single_row(pd_spark):
    df = _load(pd_spark).filter("id = 777")
    assert df.rdd.getNumPartitions() == 1
    assert [(r["id"], r["val"]) for r in df.collect()] == \
        [(777, (777 * 777) % 97)]
