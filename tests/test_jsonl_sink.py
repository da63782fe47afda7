"""Custom JSONL sink (sources/jsonl_sink.py): two-phase commit writer."""

import json
import os

from pyspark.sql import functions as F

from bdtopo2refhydro_spark.sources.jsonl_sink import (
    MANIFEST,
    register_jsonl_sink,
)

SF = "/root/testdata/sf0.001"


def test_jsonl_sink_round_trip_and_manifest(spark, tmp_path):
    assert register_jsonl_sink(spark)
    out = str(tmp_path / "shards")
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "source", "n_chars").repartition(4)
    docs.write.format("jsonl_shards").mode("append").save(out)

    manifest = json.load(open(os.path.join(out, MANIFEST)))
    assert manifest["total_rows"] == docs.count()
    assert len(manifest["shards"]) == 4
    # no temp droppings after a clean commit
    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]

    back = spark.read.json(out)
    assert back.count() == docs.count()
    a = docs.agg(F.expr("bit_xor(xxhash64(doc_id, source, n_chars))")) \
        .first()[0]
    b = back.select(
        F.col("doc_id").cast("long"), "source",
        F.col("n_chars").cast("long")) \
        .agg(F.expr("bit_xor(xxhash64(doc_id, source, n_chars))")).first()[0]
    assert a == b


def test_jsonl_sink_overwrite_replaces_shards(spark, tmp_path):
    assert register_jsonl_sink(spark)
    out = str(tmp_path / "shards")
    df1 = spark.range(100).select(F.col("id").alias("k")).repartition(8)
    df1.write.format("jsonl_shards").mode("append").save(out)
    df2 = spark.range(7).select(F.col("id").alias("k")).repartition(1)
    df2.write.format("jsonl_shards").mode("overwrite").save(out)
    manifest = json.load(open(os.path.join(out, MANIFEST)))
    assert manifest["total_rows"] == 7
    assert spark.read.json(out).count() == 7
    # overwrite swept every shard from the first write
    assert len([f for f in os.listdir(out) if f.endswith(".jsonl")]) == 1
