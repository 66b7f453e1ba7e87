"""JSON/ORC source round-trips, the foreachBatch idempotent sink, and
observe() metrics."""

from __future__ import annotations

import pyspark.sql.functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.sources import readers, writers
from march_mania_spark_lakehouse_spark.streaming.sinks import (
    count_violations,
    observed,
    start_idempotent_parquet_sink,
)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    cust = catalog.load(spark, "customer", sf_dir)
    path = str(tmp_path / "cust_json")
    writers.write_json(cust, path)
    back = readers.read_json(spark, path, schema=cust.schema)
    assert back.count() == cust.count()
    assert back.schema == cust.schema
    assert (
        back.agg(F.sum("c_custkey")).collect()[0][0]
        == cust.agg(F.sum("c_custkey")).collect()[0][0]
    )


def test_orc_roundtrip_partitioned(spark, sf_dir, tmp_path):
    orders = catalog.load(spark, "orders", sf_dir)
    path = str(tmp_path / "orders_orc")
    writers.write_orc(orders, path, partition_by=["o_orderstatus"])
    back = readers.read_orc(spark, path)
    assert back.count() == orders.count()
    # partition pruning: filtering on the partition column must show
    # PartitionFilters in the scan
    plan = (
        back.filter(F.col("o_orderstatus") == "O")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "PartitionFilters" in plan


def test_foreach_batch_sink_is_idempotent(spark, sf_dir, tmp_path):
    """Drain a 3-file stream; then re-run one batch's write with the same
    batch_id — the partition is overwritten, not duplicated."""
    events = catalog.load(spark, "events", sf_dir).select(
        "event_id", "user_id", "value"
    )
    src = str(tmp_path / "sink_src")
    events.repartition(3).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = start_idempotent_parquet_sink(stream, out, ckpt)
    q.awaitTermination(120)

    total = events.count()
    written = spark.read.parquet(out)
    assert written.count() == total

    # simulate a replay: rewrite batch 0's rows with the same batch_id
    replay = written.filter(F.col("batch_id") == 0).drop("batch_id")
    (
        replay.withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out)
    )
    assert spark.read.parquet(out).count() == total


def test_observe_metrics_piggyback_on_write(spark, sf_dir, tmp_path):
    """observe() counters come back from the same action as the write —
    and match a direct aggregation."""
    li = catalog.load(spark, "lineitem", sf_dir)
    df, obs = observed(
        li,
        "li_metrics",
        count_violations(
            ("neg_price", F.col("l_extendedprice") < 0),
            ("big_qty", F.col("l_quantity") > 45),
        ),
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_quantity") > 45, 1).otherwise(0)).alias("big"),
    ).collect()[0]
    assert got["n_rows"] == direct["n"]
    assert got["neg_price"] == 0
    assert got["big_qty"] == direct["big"]


def test_binary_file_source_reads_payload_and_metadata(spark, tmp_path):
    """binaryFile scan: content bytes round-trip, glob filters, and the
    multimodal featurizer consumes the scan output directly."""
    from march_mania_spark_lakehouse_spark.sources.readers import read_binary_files

    payloads = {"a.img": b"\x89fakepng\x00" * 40, "b.img": b"fakejpeg" * 99}
    (tmp_path / "c.txt").write_bytes(b"not media")
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    df = read_binary_files(spark, str(tmp_path), glob="*.img")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(payloads)
    for name, blob in payloads.items():
        assert bytes(rows[name].content) == blob
        assert rows[name].length == len(blob)


def test_text_source_lines_and_wholetext(spark, tmp_path):
    from march_mania_spark_lakehouse_spark.sources.readers import read_text

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "doc1.txt").write_text("line one\nline two\n")
    lines = read_text(spark, str(p)).collect()
    assert sorted(r.value for r in lines) == ["line one", "line two"]
    whole = read_text(spark, str(p), whole=True).collect()
    assert len(whole) == 1 and whole[0].value == "line one\nline two\n"


def test_parquet_schema_evolution_merges_versions(spark, tmp_path):
    """v1 files lack a column added in v2: mergeSchema unifies, v1 rows
    read NULL for it; a declared schema pins the contract either way."""
    from pyspark.sql import types as T

    from march_mania_spark_lakehouse_spark.sources.readers import (
        read_parquet_evolved,
    )

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, x string").write.mode(
        "overwrite"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, x string, score double"
    ).write.mode("append").parquet(path)

    merged = read_parquet_evolved(spark, path)
    assert set(merged.columns) == {"id", "x", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5

    pinned = read_parquet_evolved(
        spark,
        path,
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]
        ),
    )
    assert pinned.columns == ["id", "score"]
    assert {r.id: r.score for r in pinned.collect()} == rows


def test_xml_source_and_column_parse(spark, tmp_path):
    from pyspark.sql import functions as F

    from march_mania_spark_lakehouse_spark.sources.readers import read_xml

    p = tmp_path / "docs.xml"
    p.write_text(
        "<corpus>"
        "<doc id=\"1\"><lang>en</lang><body>hello world</body></doc>"
        "<doc id=\"2\"><lang>fr</lang><body>bonjour</body></doc>"
        "</corpus>"
    )
    df = read_xml(spark, str(tmp_path), "doc")
    rows = {r._id: (r.lang, r.body) for r in df.collect()}
    assert rows == {1: ("en", "hello world"), 2: ("fr", "bonjour")}

    # column form: from_xml on an embedded XML string
    s = spark.createDataFrame(
        [(1, "<m><k>7</k></m>")], "id long, payload string"
    ).select("id", F.from_xml("payload", "k INT").alias("x"))
    assert s.select(F.col("x.k")).first()[0] == 7


def test_s3a_conf_surface_is_env_gated(monkeypatch):
    """With SPARK_GRAFT_S3_ENDPOINT set, the builder must carry the full
    spark.hadoop.fs.s3a.* surface (endpoint, path-style, creds); without
    it, no s3a conf is added. Checked on the builder's options dict —
    no session is created (getOrCreate would reuse the live one)."""
    import importlib

    from march_mania_spark_lakehouse_spark import session as sess

    monkeypatch.setenv("SPARK_GRAFT_S3_ENDPOINT", "http://minio.local:9000")
    monkeypatch.setenv("SPARK_GRAFT_S3_ACCESS_KEY", "ak")
    monkeypatch.setenv("SPARK_GRAFT_S3_SECRET_KEY", "sk")
    importlib.reload(sess)

    captured = {}

    class FakeBuilder:
        def config(self, k, v):
            captured[k] = v
            return self

        def master(self, *_):
            return self

        def appName(self, *_):
            return self

        def getOrCreate(self):
            raise RuntimeError("stop before session creation")

    monkeypatch.setattr(
        sess.SparkSession, "builder", FakeBuilder(), raising=False
    )
    try:
        sess.get_spark("s3a_test")
    except RuntimeError:
        pass
    assert captured["spark.hadoop.fs.s3a.endpoint"] == "http://minio.local:9000"
    assert captured["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert captured["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert captured["spark.hadoop.fs.s3a.secret.key"] == "sk"
