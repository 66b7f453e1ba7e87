"""Sketch / manifest / z-order operator tests (queries q93–q97)."""

from __future__ import annotations

from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import sketch


class TestHllRollup:
    def test_estimates_within_error_bound(self, spark, sf_dir):
        ev = catalog.load(spark, "events", sf_dir)
        got = {
            r[0]: r[1]
            for r in sketch.hll_distinct_rollup(
                ev, "event_type", "user_id"
            ).collect()
        }
        exact = {
            r[0]: r[1]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id"))
            .collect()
        }
        exact["ALL"] = ev.select("user_id").distinct().count()
        assert set(got) == set(exact)
        for k, e in exact.items():
            # lg_k=12 → relative standard error ≈ 1.04/√4096 ≈ 1.6%
            assert abs(got[k] - e) <= max(3, 0.05 * e), (k, got[k], e)

    def test_merged_total_not_sum_of_parts(self, spark, sf_dir):
        """The ALL row must union sketches (distinct users appearing in
        several event types counted once), not add the estimates."""
        ev = catalog.load(spark, "events", sf_dir)
        rows = {
            r[0]: r[1]
            for r in sketch.hll_distinct_rollup(
                ev, "event_type", "user_id"
            ).collect()
        }
        parts_sum = sum(v for k, v in rows.items() if k != "ALL")
        assert rows["ALL"] <= parts_sum


class TestBitmapDistinct:
    def test_matches_count_distinct(self, spark, sf_dir):
        orders = catalog.load(spark, "orders", sf_dir)
        got = {
            r[0]: r[1]
            for r in sketch.bitmap_exact_distinct(
                orders, ["o_orderstatus"], "o_custkey"
            ).collect()
        }
        exact = {
            r[0]: r[1]
            for r in orders.groupBy("o_orderstatus")
            .agg(F.countDistinct("o_custkey"))
            .collect()
        }
        assert got == exact


class TestCms:
    def test_bounds(self, spark, sf_dir):
        ev = catalog.load(spark, "events", sf_dir)
        eps = 0.001
        n_total = ev.count()
        est = {
            r.key: r.est_count
            for r in sketch.cms_frequency_estimates(
                ev, "user_id", range(1, 21), eps=eps
            ).collect()
        }
        exact = {
            r[0]: r[1]
            for r in ev.filter(F.col("user_id") < 21)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)))
            .collect()
        }
        for k in range(1, 21):
            true = exact.get(k, 0)
            assert est[k] >= true, (k, est[k], true)
            assert est[k] <= true + eps * n_total * 3, (k, est[k], true)


class TestManifestPruning:
    def test_manifest_covers_all_rows(self, spark, sf_dir):
        orders = catalog.load(spark, "orders", sf_dir)
        m = sketch.file_stats_manifest(orders, ["o_orderkey"])
        rows = m.collect()
        assert sum(r.n_rows for r in rows) == orders.count()
        assert all(r.min_o_orderkey <= r.max_o_orderkey for r in rows)

    def test_pruning_is_sound(self, spark, tmp_path, sf_dir):
        """Write a key-partitioned copy (one file per key range), prune
        for a range, and check every matching row lives in a kept file."""
        orders = catalog.load(spark, "orders", sf_dir).limit(2000)
        path = str(tmp_path / "orders_ranged")
        (
            orders.withColumn("kb", F.expr("o_orderkey div 500"))
            .repartitionByRange(4, "kb")
            .write.partitionBy("kb")
            .mode("overwrite")
            .parquet(path)
        )
        again = spark.read.parquet(path)
        manifest = sketch.file_stats_manifest(again, ["o_orderkey"])
        assert manifest.count() >= 2  # really multiple files
        lo, hi = 600, 900
        kept = {r.file for r in sketch.prune_files(manifest, "o_orderkey", lo, hi).collect()}
        matching_files = {
            r.file
            for r in again.withColumn(
                "file", F.regexp_extract(F.input_file_name(), "([^/]+)$", 1)
            )
            .filter(F.col("o_orderkey").between(lo, hi))
            .select("file")
            .distinct()
            .collect()
        }
        assert matching_files <= kept
        assert len(kept) < manifest.count()  # and it actually pruned


class TestZorder:
    def test_interleave_bits(self, spark):
        df = spark.createDataFrame(
            [(0b101, 0b011)], "x long, y long"
        ).select(sketch.zorder_key(["x", "y"], bits=3).alias("z"))
        # x bits go to even positions, y bits to odd:
        # x=101 -> z bits 0,4 set; y=011 -> z bits 1,3 set
        assert df.first().z == (1 << 0) + (1 << 4) + (1 << 1) + (1 << 3)

    def test_locality_beats_single_sort(self, spark, sf_dir):
        """Range filter on the SECOND dimension: under z-order the
        matching rows concentrate in fewer contiguous rank-buckets than
        under a single-column lexicographic sort."""
        orders = catalog.load(spark, "orders", sf_dir).limit(4000)
        dim2 = (F.col("o_orderkey") % 256).alias("d2")
        base = orders.select(F.col("o_custkey").alias("d1"), dim2)

        def buckets_touched(keyed):
            w = keyed.select(
                "d1", "d2", F.ntile(64).over(
                    __import__("pyspark").sql.Window.orderBy("k")
                ).alias("bucket"),
            )
            return (
                w.filter(F.col("d2").between(10, 20))
                .select("bucket").distinct().count()
            )

        z = buckets_touched(base.withColumn("k", sketch.zorder_key(["d1", "d2"], bits=8)))
        lex = buckets_touched(
            base.withColumn("k", F.col("d1") * 1000000 + F.col("d2"))
        )
        assert z < lex


class TestPsiDrift:
    def test_identical_distribution_is_near_zero(self, spark):
        from march_mania_spark_lakehouse_spark.operators.drift import psi_report

        df = spark.range(10000).select(
            (F.col("id") % 100).cast("double").alias("x"),
            (F.col("id") % 2 == 0).alias("ref"),
        )
        rows = {r.bucket: r.psi for r in psi_report(
            df, "x", F.col("ref"), lo=0.0, hi=100.0
        ).collect()}
        assert abs(rows[-1]) < 1e-6

    def test_shifted_distribution_alerts(self, spark):
        from march_mania_spark_lakehouse_spark.operators.drift import psi_report

        # reference uniform on [0,50); current uniform on [50,100)
        df = spark.range(10000).select(
            F.when(F.col("id") % 2 == 0, (F.col("id") % 50).cast("double"))
            .otherwise(50 + (F.col("id") % 50).cast("double"))
            .alias("x"),
            (F.col("id") % 2 == 0).alias("ref"),
        )
        rows = {r.bucket: r.psi for r in psi_report(
            df, "x", F.col("ref"), lo=0.0, hi=100.0
        ).collect()}
        assert rows[-1] > 0.25  # "broken" territory

    def test_out_of_range_rows_clamp_not_drop(self, spark):
        """Values outside [lo, hi] clamp to the edge buckets: shares per
        side must still sum to ~1 (no row lost), with the out-of-range
        mass visible at buckets 0 and n_bins-1."""
        from march_mania_spark_lakehouse_spark.operators.drift import psi_report

        df = spark.range(1000).select(
            (F.col("id").cast("double") - 500).alias("x"),  # half below lo
            (F.col("id") % 2 == 0).alias("ref"),
        )
        out = psi_report(df, "x", F.col("ref"), lo=0.0, hi=10.0).collect()
        p_sum = sum(r.p for r in out if r.bucket >= 0)
        q_sum = sum(r.q for r in out if r.bucket >= 0)
        assert abs(p_sum - 1.0) < 1e-3 and abs(q_sum - 1.0) < 1e-3
        by_bucket = {r.bucket: r for r in out}
        # clamped below-lo mass makes bucket 0 by far the heaviest
        assert by_bucket[0].p > 0.5 and by_bucket[0].q > 0.5

    def test_empty_split_degrades_not_errors(self, spark):
        """An all-reference input (current split empty) must produce a
        finite report, not an ANSI divide-by-zero."""
        from march_mania_spark_lakehouse_spark.operators.drift import psi_report

        df = spark.range(100).select(
            (F.col("id") % 10).cast("double").alias("x"), F.lit(True).alias("ref")
        )
        out = psi_report(df, "x", F.col("ref"), lo=0.0, hi=10.0).collect()
        assert all(r.psi is not None for r in out)


class TestQuantize:
    def test_roundtrip_cosine(self, spark, sf_dir):
        from march_mania_spark_lakehouse_spark.operators import quantize
        from march_mania_spark_lakehouse_spark.operators.similarity import cosine

        emb = catalog.load(spark, "embeddings", sf_dir).limit(200)
        scales = quantize.dim_scales(emb, "embedding")
        assert all(s > 0 for s in scales)
        enc = emb.select(
            "embedding",
            quantize.dequantize_int8(
                quantize.quantize_int8("embedding", scales), scales
            ).alias("approx"),
        )
        worst = enc.select(
            cosine(F.col("embedding"), F.col("approx")).alias("c")
        ).agg(F.min("c")).first()[0]
        assert worst > 0.995, worst

    def test_codes_bounded(self, spark, sf_dir):
        from march_mania_spark_lakehouse_spark.operators import quantize

        emb = catalog.load(spark, "embeddings", sf_dir).limit(200)
        out = quantize.with_int8_codes(emb)
        mx = out.select(
            F.array_max(F.transform("codes", lambda x: F.abs(x))).alias("m")
        ).agg(F.max("m")).first()[0]
        assert mx <= 127


class TestStreamingHllMerge:
    def test_two_batches_merge_to_global_estimate(self, spark, sf_dir, tmp_path):
        from march_mania_spark_lakehouse_spark.streaming.sinks import (
            start_hll_merge_sink,
        )

        ev = catalog.load(spark, "events", sf_dir).select("event_id", "user_id")
        half = ev.count() // 2
        src = str(tmp_path / "src")
        ev.limit(half).coalesce(1).write.mode("overwrite").parquet(src)

        state = str(tmp_path / "state")
        q = start_hll_merge_sink(
            spark.readStream.schema(ev.schema).parquet(src),
            "user_id",
            state,
            str(tmp_path / "ck1"),
        )
        q.awaitTermination(120)
        first = spark.read.parquet(state).first()
        assert first.n_batches >= 1

        # second slice arrives; a NEW availableNow query picks it up
        ev.coalesce(1).write.mode("append").parquet(src)
        q2 = start_hll_merge_sink(
            spark.readStream.schema(ev.schema).parquet(src),
            "user_id",
            state,
            str(tmp_path / "ck1"),  # same checkpoint: only new files replay
            )
        q2.awaitTermination(120)

        got = spark.read.parquet(state).first()
        exact = ev.select("user_id").distinct().count()
        assert abs(got.approx_distinct - exact) <= max(3, 0.05 * exact)


class TestPythonDataSource:
    def test_synthetic_docs_source(self, spark):
        from march_mania_spark_lakehouse_spark.operators.text import token_count
        from march_mania_spark_lakehouse_spark.sources.pydatasource import (
            SyntheticDocsDataSource,
        )

        spark.dataSource.register(SyntheticDocsDataSource)
        df = (
            spark.read.format("synthetic_docs")
            .option("rows", 250)
            .option("partitions", 5)
            .load()
        )
        assert df.rdd.getNumPartitions() == 5
        assert df.count() == 250
        assert df.select("doc_id").distinct().count() == 250
        # deterministic across reads
        a = {r.doc_id: r.text for r in df.collect()}
        b = {r.doc_id: r.text for r in df.collect()}
        assert a == b
        # composes with engine operators
        n = df.select(token_count("text").alias("n")).agg(F.min("n")).first()[0]
        assert n >= 5


class TestNearDupDedup:
    def test_planted_duplicates_collapse_transitively(self, spark):
        from march_mania_spark_lakehouse_spark.operators.dedup import near_dup_dedup

        base = "the quick brown fox jumps over the lazy dog again and again today"
        rows = [
            (1, base),
            (2, base + " extra"),                       # ≈ 1
            (3, base.replace("quick", "quick very")),   # ≈ 1 (and ≈ 2 transitively)
            (10, "completely different text about spark query engines at scale"),
            (11, "yet another unrelated document mentioning embeddings and ann"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kept = sorted(r.doc_id for r in near_dup_dedup(
            df, "doc_id", threshold=0.3, num_hashes=16, bands=8
        ).collect())
        # the near-dup cluster {1,2,3} collapses to its min id
        assert 1 in kept and 2 not in kept and 3 not in kept
        # unrelated docs untouched
        assert 10 in kept and 11 in kept

    def test_no_duplicates_is_identity(self, spark):
        from march_mania_spark_lakehouse_spark.operators.dedup import near_dup_dedup

        rows = [
            (i, f"document number {i} with its own distinct vocabulary token{i} word{i*7}")
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert near_dup_dedup(df, "doc_id", threshold=0.8).count() == 20


def test_python_streaming_datasource_offsets_and_restart(spark, tmp_path):
    """Python Data Source streaming API: the synthetic stream must (a)
    emit exactly maxrows rows across offset-tracked micro-batches with
    no duplicates, and (b) resume from the checkpointed offset on
    restart instead of replaying from zero."""
    import uuid as _uuid

    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        SyntheticDocsStreamDataSource,
    )

    spark.dataSource.register(SyntheticDocsStreamDataSource)
    sink = str(tmp_path / "pyds_sink")
    ckpt = str(tmp_path / "pyds_ckpt")

    def drain(maxrows):
        stream = (
            spark.readStream.format("synthetic_docs_stream")
            .option("maxrows", maxrows)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain(100)
    first = spark.read.parquet(sink)
    assert first.count() == 100
    assert first.select("doc_id").distinct().count() == 100

    # restart with a higher high-water mark: resumes at offset 100,
    # emits ONLY 100..149 (checkpointed offset, not initialOffset)
    drain(150)
    out = spark.read.parquet(sink)
    assert out.count() == 150
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert ids == set(range(150))


def test_cms_portable_estimates_dominate_truth(spark, sf_dir):
    """Portable CMS: min-over-depth bucket counts must be >= every
    key's true frequency (the one-sided CMS guarantee), and the matrix
    must total depth * n_rows."""
    from march_mania_spark_lakehouse_spark.operators.sketch import (
        cms_portable_sketch,
    )

    ev = catalog.load(spark, "events", sf_dir)
    depth, width, p = 4, 64, 1_000_000_007
    sk = {(r["depth"], r["bucket"]): r["cnt"]
          for r in cms_portable_sketch(ev, "user_id", depth, width).collect()}
    n = ev.count()
    assert sum(sk.values()) == depth * n

    truth = {r["user_id"]: r["n"] for r in
             ev.groupBy("user_id").agg(F.count("*").alias("n")).limit(50).collect()}
    for k, true_n in truth.items():
        est = min(
            sk.get((d, ((k * (2 * d + 3) + 101 * d + 29) % p) % width), 0)
            for d in range(depth)
        )
        assert est >= true_n  # CMS never undercounts


def test_hll_portable_estimate_accuracy(spark, sf_dir):
    """Portable HLL registers: the standard harmonic-mean estimate over
    the 64 registers must land within 3 standard errors (1.04/sqrt(m) ~
    13%) of the true distinct count."""
    import math

    from march_mania_spark_lakehouse_spark.operators.sketch import (
        hll_portable_registers,
    )

    ev = catalog.load(spark, "events", sf_dir)
    m = 64
    regs = {r["bucket"]: r["register"]
            for r in hll_portable_registers(ev, "user_id", m=m).collect()}
    true_n = ev.select("user_id").distinct().count()

    alpha = 0.709  # alpha_64 per the HLL paper
    z = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    est = alpha * m * m / z
    if est <= 2.5 * m:  # small-range correction (linear counting)
        zeros = sum(1 for b in range(m) if regs.get(b, 0) == 0)
        if zeros:
            est = m * math.log(m / zeros)
    assert abs(est - true_n) / true_n < 3 * 1.04 / math.sqrt(m)


def test_histogram_sketch_merges_without_drift(spark, sf_dir):
    """Sketch state is mergeable by addition: histograms of two disjoint
    halves, unioned and re-summed, must equal the single-pass histogram
    bit-for-bit — and the quantiles estimated from the merged state must
    equal the single-pass estimates exactly (no merge-order error, the
    property rank sketches lack)."""
    li = catalog.load(spark, "lineitem", sf_dir)
    lo, hi, bins = 0.0, 150000.0, 256
    full = sketch.histogram_sketch(li, "l_extendedprice", ["l_returnflag"], lo, hi, bins)
    h1 = sketch.histogram_sketch(
        li.filter(F.col("l_orderkey") % 2 == 0),
        "l_extendedprice", ["l_returnflag"], lo, hi, bins)
    h2 = sketch.histogram_sketch(
        li.filter(F.col("l_orderkey") % 2 == 1),
        "l_extendedprice", ["l_returnflag"], lo, hi, bins)
    merged = (
        h1.unionByName(h2)
        .groupBy("l_returnflag", "bin")
        .agg(F.sum("n").alias("n"))
    )
    key = lambda df: {  # noqa: E731
        (r["l_returnflag"], r["bin"]): r["n"] for r in df.collect()
    }
    assert key(merged) == key(full)
    qf = sketch.quantiles_from_histogram(full, ["l_returnflag"], (0.5, 0.95), lo, hi, bins)
    qm = sketch.quantiles_from_histogram(merged, ["l_returnflag"], (0.5, 0.95), lo, hi, bins)
    ests = lambda df: {  # noqa: E731
        (r["l_returnflag"], r["q"]): r["est"] for r in df.collect()
    }
    assert ests(qm) == ests(qf)  # bit-identical, not approximately


def test_histogram_quantile_error_bounded_by_bin_width(spark, sf_dir):
    """|histogram estimate − exact percentile| ≤ one bin width, for
    every group and probed quantile."""
    li = catalog.load(spark, "lineitem", sf_dir)
    lo, hi, bins = 0.0, 150000.0, 256
    width = (hi - lo) / bins
    h = sketch.histogram_sketch(li, "l_extendedprice", ["l_returnflag"], lo, hi, bins)
    est = {
        (r["l_returnflag"], r["q"]): r["est"]
        for r in sketch.quantiles_from_histogram(
            h, ["l_returnflag"], (0.5, 0.95, 0.99), lo, hi, bins
        ).collect()
    }
    exact = {
        (r["l_returnflag"], q): r[f"p{int(q*100)}"]
        for r in li.groupBy("l_returnflag").agg(
            *[
                F.percentile(F.col("l_extendedprice"), F.lit(q)).alias(f"p{int(q*100)}")
                for q in (0.5, 0.95, 0.99)
            ]
        ).collect()
        for q in (0.5, 0.95, 0.99)
    }
    assert set(est) == set(exact)
    for k in est:
        assert abs(est[k] - exact[k]) <= width, (k, est[k], exact[k])


def test_ols_trend_matches_numpy_reference(spark, sf_dir):
    """q173's fixed-point sufficient-statistics slope/intercept must
    agree with numpy's least-squares fit on the same points to well
    inside the 1e-4 fixed-point quantization."""
    import numpy as np

    from march_mania_spark_lakehouse_spark.plans import all_queries

    got = {
        r["l_returnflag"]: (r["slope"], r["intercept"])
        for r in all_queries()["q173_group_trend_ols"].fn(spark, sf_dir).collect()
    }
    li = catalog.load(spark, "lineitem", sf_dir)
    pdf = li.select(
        "l_returnflag",
        F.datediff("l_shipdate", F.lit("1995-01-01").cast("timestamp")).alias("x"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    ).toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        m, b = np.polyfit(grp.x.to_numpy(float), grp.y.to_numpy(float), 1)
        assert abs(got[flag][0] - m) < 1e-6, (flag, got[flag][0], m)
        assert abs(got[flag][1] - b) < 1e-2, (flag, got[flag][1], b)


def test_mad_outliers_matches_numpy_reference(spark, sf_dir):
    """q172's med/mad/outlier-count vs a direct numpy recompute."""
    import numpy as np

    from march_mania_spark_lakehouse_spark.plans import all_queries

    got = {
        r["l_returnflag"]: (r["med"], r["mad"], r["n_outliers"])
        for r in all_queries()["q172_mad_outliers"].fn(spark, sf_dir).collect()
    }
    li = catalog.load(spark, "lineitem", sf_dir)
    pdf = li.select("l_returnflag", "l_extendedprice").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        v = grp.l_extendedprice.to_numpy(float)
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        n_out = int((np.abs(v - med) > 3 * 1.4826 * mad).sum())
        assert got[flag] == (med, mad, n_out), (flag, got[flag], (med, mad, n_out))
