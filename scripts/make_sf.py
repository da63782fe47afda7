"""Generate an sf1-sized fixture (10x sf0.1) for the >sf0.1 exactness
sweep (VERDICT r3 #5).

/root/testdata is read-only and stops at sf0.1, so this synthesizes a
schema-identical star-schema + documents/embeddings dataset at any
scale, all columns deterministic integer/LCG arithmetic (seedless, no
RNG). The oracle comparison is SELF-consistent — Spark and DuckDB both
read the same parquet — so value distributions only need to cover the
same shapes (languages, sources, flag/status domains, date ranges,
2-decimal money) as the driver fixtures, which they replicate.

Usage: python scripts/make_sf.py [out_dir] [n_docs]
  default: /tmp/sf1 50000   (sf1 ≈ 6M lineitem rows)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
SCALE = N_DOCS / 5000.0  # vs sf0.1

H = "((id * 1103515245 + 12345) % 2147483648)"
VOCAB = ("the sort value hash filter big dup line small group query row "
         "stream batch data column order a vector part scan slow agg key "
         "window table merge join spark fast customer").split()


def _write(df, name):
    df.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
    print(name, "written")


def main() -> int:
    from bdtopo2refhydro_spark.session import get_spark

    spark = get_spark("make_sf", cores=32, shuffle_partitions=64)
    os.makedirs(OUT, exist_ok=True)
    vocab = ", ".join(f"'{w}'" for w in VOCAB)

    # documents: doc_id 0..N-1, 15-60 token text over the same vocab,
    # ~8% planted exact duplicates (text copied from doc_id-7), langs and
    # sources with the driver fixture's domains
    base_text = (
        f"concat_ws(' ', transform(sequence(1, 15 + {H} % 46), "
        f"i -> element_at(array({vocab}), "
        f"cast((({H} div 7 + i * ({H} % 97 + 1))) % 31 + 1 as int))))")
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), F.expr(base_text).alias("text"),
        F.expr(f"element_at(array('en','en','en','en','fr','de','es','zh',"
               f"'en','fr'), cast({H} % 10 + 1 as int))").alias("lang"),
        F.expr(f"concat('src', cast({H} % 20 as string))").alias("source"),
    )
    dup_src = docs.select((F.col("doc_id") + 7).alias("doc_id"),
                          F.col("text").alias("_dup"))
    docs = (
        docs.join(dup_src, "doc_id", "left")
        .select(
            "doc_id",
            F.when((F.col("doc_id") % 13 == 0) & F.col("_dup").isNotNull(),
                   F.col("_dup")).otherwise(F.col("text")).alias("text"),
            "lang", "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    _write(docs.repartition(64), "documents")

    n_vec = int(2000 * SCALE)
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), d -> cast("
            "(((id * 64 + d) * 1103515245 + 12345) % 2147483648 % 2000) "
            "/ 1000.0 - 1.0 as float))").alias("embedding"),
        F.expr(f"cast({H} % 10 as int)").alias("label"),
    )
    _write(emb.repartition(16), "embeddings")

    n_li = int(600_000 * SCALE)
    n_ord = int(150_000 * SCALE)
    n_cust = int(15_000 * SCALE)
    n_supp = int(1_000 * SCALE)
    n_part = int(20_000 * SCALE)
    li = spark.range(n_li).select(
        F.expr(f"id % {n_ord}").alias("l_orderkey"),
        F.expr(f"{H} % {n_part}").alias("l_partkey"),
        F.expr(f"({H} div 11) % {n_supp}").alias("l_suppkey"),
        F.expr(f"cast(id div {n_ord} + 1 as int)").alias("l_linenumber"),
        F.expr(f"cast(1 + {H} % 50 as double)").alias("l_quantity"),
        F.expr(f"cast(90000 + ({H} div 13) % 10410000 as double) / 100.0")
        .alias("l_extendedprice"),
        F.expr(f"cast(({H} div 17) % 11 as double) / 100.0")
        .alias("l_discount"),
        F.expr(f"cast(({H} div 19) % 9 as double) / 100.0").alias("l_tax"),
        F.expr(f"element_at(array('R','A','N'), cast({H} % 3 + 1 as int))")
        .alias("l_returnflag"),
        F.expr(f"element_at(array('O','F'), cast(({H} div 23) % 2 + 1 as int))")
        .alias("l_linestatus"),
        F.expr(f"timestamp'1995-01-01' + make_interval(0, 0, 0, "
               f"cast(({H} div 29) % 2500 as int), 0, 0, 0)")
        .alias("l_shipdate"),
    )
    _write(li.repartition(64), "lineitem")

    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        F.expr(f"{H} % {n_cust}").alias("o_custkey"),
        F.expr(f"element_at(array('O','F','P'), cast({H} % 3 + 1 as int))")
        .alias("o_orderstatus"),
        F.expr(f"cast(100000 + ({H} div 7) % 50000000 as double) / 100.0")
        .alias("o_totalprice"),
        F.expr(f"timestamp'1995-01-01' + make_interval(0, 0, 0, "
               f"cast(({H} div 11) % 2400 as int), 0, 0, 0)")
        .alias("o_orderdate"),
        F.expr(f"element_at(array('1-URGENT','2-HIGH','3-MEDIUM',"
               f"'4-NOT SPECIFIED','5-LOW'), cast(({H} div 13) % 5 + 1 "
               f"as int))").alias("o_orderpriority"),
    )
    _write(orders.repartition(32), "orders")

    events = spark.range(int(100_000 * SCALE)).select(
        F.col("id").alias("event_id"),
        F.expr(f"timestamp'2024-01-01' + make_interval(0, 0, 0, 0, 0, 0, "
               f"cast(id * 41 + ({H} % 1000000) / 1000000.0 as double))")
        .alias("ts"),
        F.expr(f"{H} % 2000").alias("user_id"),
        F.expr(f"element_at(array('view','click','purchase','signup',"
               f"'error'), cast({H} % 5 + 1 as int))").alias("event_type"),
        F.expr(f"cast(({H} div 3) % 20000 as double) / 100.0").alias("value"),
        F.expr(f"concat('{{\"k\": ', cast({H} % 100 as string), '}}')")
        .alias("props"),
    )
    _write(events.repartition(32), "events")

    customer = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.expr("concat('Customer#', lpad(cast(id as string), 9, '0'))")
        .alias("c_name"),
        F.expr(f"cast({H} % 25 as int)").alias("c_nationkey"),
        F.expr(f"cast(-99999 + {H} % 1100000 as double) / 100.0")
        .alias("c_acctbal"),
        F.expr(f"element_at(array('BUILDING','HOUSEHOLD','FURNITURE',"
               f"'AUTOMOBILE','MACHINERY'), cast(({H} div 7) % 5 + 1 "
               f"as int))").alias("c_mktsegment"),
    )
    _write(customer, "customer")

    supplier = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.expr("concat('Supplier#', lpad(cast(id as string), 9, '0'))")
        .alias("s_name"),
        F.expr(f"cast({H} % 25 as int)").alias("s_nationkey"),
        F.expr(f"cast(-99999 + ({H} div 3) % 1100000 as double) / 100.0")
        .alias("s_acctbal"),
    )
    _write(supplier, "supplier")

    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.expr(f"concat(element_at(array('large','hot','blue','green',"
               f"'small'), cast({H} % 5 + 1 as int)), ' ', "
               f"element_at(array('ring','bolt','case','drum','plate'), "
               f"cast(({H} div 7) % 5 + 1 as int)))").alias("p_name"),
        F.expr(f"concat('Brand#', cast(({H} div 11) % 25 as string))")
        .alias("p_brand"),
        F.expr(f"element_at(array('ECONOMY','MEDIUM','SMALL','PROMO',"
               f"'LARGE','STANDARD'), cast(({H} div 13) % 6 + 1 as int))")
        .alias("p_type"),
        F.expr(f"cast(1 + ({H} div 17) % 50 as int)").alias("p_size"),
        F.expr(f"cast(90000 + ({H} div 19) % 1000000 as double) / 100.0")
        .alias("p_retailprice"),
    )
    _write(part, "part")

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.expr("concat('NATION_', cast(id as string))").alias("n_name"),
        F.expr("cast(id % 5 as int)").alias("n_regionkey"),
    )
    _write(nation.coalesce(1), "nation")

    region = spark.createDataFrame(
        [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
         (4, "MIDDLE EAST")],
        "r_regionkey int, r_name string")
    _write(region.coalesce(1), "region")
    spark.stop()
    print("done:", OUT)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
