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
