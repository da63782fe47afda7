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


def test_stream_writer_multi_batch_round_trip(spark, tmp_path):
    """Two parquet files + maxFilesPerTrigger=1 => two micro-batches:
    the _COMMITS log records each batch once, per-batch shards carry
    the batch id in their names, and the read-back equals the union."""
    from bdtopo2refhydro_spark.sources.jsonl_sink import COMMIT_LOG

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    df = spark.range(10).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3).cast("long").alias("v"))
    df.where("k < 5").coalesce(1).write.parquet(str(src / "a"))
    df.where("k >= 5").coalesce(1).write.parquet(str(src / "b"))

    assert register_jsonl_sink(spark)
    q = (spark.readStream.schema("k long, v long")
         .option("maxFilesPerTrigger", 1)
         .parquet(f"{src}/*/")
         .writeStream.format("jsonl_shards")
         .option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    with open(out / COMMIT_LOG) as fh:
        commits = [json.loads(line) for line in fh if line.strip()]
    assert sorted(c["batch_id"] for c in commits) == [0, 1]
    shards = [s["shard"] for c in commits for s in c["shards"]]
    assert all(s.startswith("part-b0000") for s in shards)
    back = spark.read.schema("k long, v long").json(
        str(out), pathGlobFilter="*.jsonl")
    got = {(r.k, r.v) for r in back.collect()}
    assert got == {(i, 3 * i) for i in range(10)}


def test_stream_writer_replayed_batch_is_committed_noop(spark, tmp_path):
    """Exactly-once on replay: a commit() for an ALREADY-LOGGED batchId
    renames nothing (no duplicate shards) and sweeps the replay's temp
    files — driven directly against the writer protocol."""
    from bdtopo2refhydro_spark.sources.jsonl_sink import (
        COMMIT_LOG,
        _lazy_datasource,
    )

    ds_cls = _lazy_datasource()
    ds = ds_cls(options={"path": str(tmp_path)})
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("k", T.LongType())])
    w = ds.streamWriter(schema, overwrite=False)

    class Msg:
        def __init__(self, tmp, final, rows):
            self.tmp_name, self.final_name, self.rows = tmp, final, rows

    # first attempt of batch 0
    (tmp_path / ".t1.inprogress").write_text('{"k": 1}\n')
    w.commit([Msg(".t1.inprogress", "00000", 1)], 0)
    assert (tmp_path / "part-b00000-00000.jsonl").exists()
    # replay of batch 0 (e.g. driver restart re-ran the epoch)
    (tmp_path / ".t2.inprogress").write_text('{"k": 99}\n')
    w.commit([Msg(".t2.inprogress", "00000", 1)], 0)
    assert not (tmp_path / ".t2.inprogress").exists()  # swept
    # the shard still holds the FIRST attempt's bytes
    assert (tmp_path / "part-b00000-00000.jsonl").read_text() == '{"k": 1}\n'
    with open(tmp_path / COMMIT_LOG) as fh:
        assert sum(1 for line in fh if line.strip()) == 1
