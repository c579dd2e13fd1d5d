"""Skew utilities and file-sink tests."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pandas_to_postgres_spark.operators.skew import salt_join, salted_agg
from pandas_to_postgres_spark.sinks.files import (
    write_csv,
    write_json,
    write_parquet_partitioned,
)

TMP = "/root/repo/.tmp_test_out"


@pytest.fixture(autouse=True)
def _clean_tmp():
    yield
    shutil.rmtree(TMP, ignore_errors=True)


class TestSkew:
    def _skewed(self, spark):
        # one hot key (90% of rows) + a uniform tail
        hot = spark.range(900).select(
            F.lit("hot").alias("k"), F.col("id").alias("v")
        )
        tail = spark.range(100).select(
            F.concat(F.lit("k"), F.col("id") % 10).alias("k"), F.col("id").alias("v")
        )
        return hot.unionByName(tail)

    def test_salted_agg_matches_plain(self, spark):
        df = self._skewed(spark)
        plain = {
            (r.k): (r.n, r.s, r.mn, r.mx)
            for r in df.groupBy("k")
            .agg(
                F.count("v").alias("n"), F.sum("v").alias("s"),
                F.min("v").alias("mn"), F.max("v").alias("mx"),
            )
            .collect()
        }
        salted = {
            (r.k): (r.n, r.s, r.mn, r.mx)
            for r in salted_agg(
                df,
                keys=["k"],
                aggs={"n": ("v", "count"), "s": ("v", "sum"),
                      "mn": ("v", "min"), "mx": ("v", "max")},
                salt_cols=["v"],
                buckets=8,
            ).collect()
        }
        assert salted == plain

    def test_salt_join_matches_plain(self, spark):
        big = self._skewed(spark)
        small = spark.createDataFrame(
            [("hot", "H"), ("k1", "A"), ("k5", "B")], "sk string, label string"
        )
        plain = sorted(
            (r.k, r.v, r.label)
            for r in big.join(small, big.k == small.sk).select("k", "v", "label").collect()
        )
        salted = sorted(
            (r.k, r.v, r.label)
            for r in salt_join(big, small, "k", "sk", salt_cols=["v"], buckets=8)
            .select("k", "v", "label")
            .collect()
        )
        assert salted == plain
        assert len(salted) == 900 + 10 + 10  # hot + k1 tail + k5 tail


class TestFileSinks:
    def test_parquet_partitioned_roundtrip_and_pruning(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "id long, part string"
        )
        write_parquet_partitioned(df, f"{TMP}/pq", ["part"], max_records_per_file=1)
        back = spark.read.parquet(f"{TMP}/pq")
        assert back.count() == 3
        # partition pruning: filter on the partition column reads one dir
        pruned = back.filter(F.col("part") == "a")
        assert pruned.count() == 2
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan or pruned.count() == 2

    def test_csv_null_convention(self, spark):
        df = spark.createDataFrame([(1, None), (2, "x")], "id long, s string")
        write_csv(df, f"{TMP}/csv", num_partitions=1)
        back = spark.read.option("header", "true").csv(f"{TMP}/csv")
        vals = {r.id: r.s for r in back.collect()}
        assert vals == {"1": None, "2": "x"}

    def test_json_roundtrip(self, spark):
        df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
        write_json(df, f"{TMP}/json")
        back = spark.read.json(f"{TMP}/json")
        assert back.collect()[0].v == [1.0, 2.0]


class TestBucketedJoin:
    """Bucketed tables: the join plan must contain no Exchange (co-located
    read) and must equal the plain-join result."""

    def test_exchange_free_join(self, spark):
        import io
        import contextlib

        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.sinks.bucketed import (
            bucketed_join,
            drop_table,
            write_bucketed,
        )
        from pandas_to_postgres_spark.sources.parquet import load_table

        li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        o = load_table(spark, "/root/testdata/sf0.001", "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # force SMJ: broadcast would mask the property under test
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            write_bucketed(li, "t_li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
            write_bucketed(o, "t_o_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
            joined = bucketed_join(spark, "t_li_b", "t_o_b", ["l_orderkey"])
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
            expect = li.join(o, "l_orderkey").count()
            assert joined.count() == expect
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            drop_table(spark, "t_li_b")
            drop_table(spark, "t_o_b")

    def test_bucketed_agg_no_exchange(self, spark):
        import io
        import contextlib

        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.sinks.bucketed import drop_table, write_bucketed
        from pandas_to_postgres_spark.sources.parquet import load_table

        li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        try:
            write_bucketed(li, "t_li_agg", ["l_orderkey"], 8)
            agg = spark.table("t_li_agg").groupBy("l_orderkey").agg(
                F.sum("l_quantity").alias("q")
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                agg.explain("formatted")
            assert "Exchange" not in buf.getvalue()
            assert agg.count() == li.select("l_orderkey").distinct().count()
        finally:
            drop_table(spark, "t_li_agg")


class TestFileSources:
    def test_csv_schema_roundtrip_null_preserving(self, spark):
        from pandas_to_postgres_spark.sources.files import load_csv

        df = spark.createDataFrame(
            [(1, None, 1.5), (2, "x", None)], "id long, s string, v double"
        )
        write_csv(df, f"{TMP}/src_csv", num_partitions=1)
        back = load_csv(spark, f"{TMP}/src_csv", schema="id long, s string, v double")
        assert back.schema == df.schema
        rows = {r.id: (r.s, r.v) for r in back.collect()}
        assert rows == {1: (None, 1.5), 2: ("x", None)}

    def test_csv_requires_schema_or_optin(self, spark):
        from pandas_to_postgres_spark.sources.files import load_csv

        with pytest.raises(ValueError):
            load_csv(spark, f"{TMP}/whatever")

    def test_json_schema_roundtrip_nested(self, spark):
        from pandas_to_postgres_spark.sources.files import load_json

        df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
        write_json(df, f"{TMP}/src_json")
        back = load_json(spark, f"{TMP}/src_json", schema="id long, v array<double>")
        assert back.schema == df.schema
        assert back.collect()[0].v == [1.0, 2.0]

    def test_orc_roundtrip(self, spark):
        from pandas_to_postgres_spark.sources.files import load_orc

        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
        df.write.mode("overwrite").orc(f"{TMP}/src_orc")
        back = load_orc(spark, f"{TMP}/src_orc")
        assert sorted((r.id, r.s) for r in back.collect()) == [(1, "a"), (2, "b")]


class TestIncrementalDedup:
    def test_batch_vs_corpus_and_within_batch(self, spark):
        from pandas_to_postgres_spark.operators.dedup import dedup_incremental

        corpus = spark.createDataFrame(
            [(1, "already ingested"), (2, "old news")], "doc_id long, text string"
        )
        batch = spark.createDataFrame(
            [
                (10, "already ingested"),   # dup of corpus -> dropped
                (11, "brand new"),          # survives
                (12, "brand new"),          # within-batch dup -> dropped
                (13, "also new"),           # survives
            ],
            "doc_id long, text string",
        )
        out = dedup_incremental(batch, corpus, "text", "doc_id")
        assert sorted(r.doc_id for r in out.collect()) == [11, 13]
        # schema passthrough: helper columns dropped
        assert out.columns == ["doc_id", "text"]

    def test_empty_corpus_is_plain_dedup(self, spark):
        from pandas_to_postgres_spark.operators.dedup import dedup_incremental

        corpus = spark.createDataFrame([], "doc_id long, text string")
        batch = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id long, text string"
        )
        out = dedup_incremental(batch, corpus, "text", "doc_id")
        assert sorted(r.doc_id for r in out.collect()) == [1, 3]


class TestCompaction:
    def test_compacts_many_small_files(self, spark):
        from pandas_to_postgres_spark.sinks.files import compact_dataset

        df = spark.range(10000).selectExpr("id", "id % 7 AS v")
        df.repartition(40).write.mode("overwrite").parquet(f"{TMP}/frag")
        n_before = len(spark.read.parquet(f"{TMP}/frag").inputFiles())
        assert n_before >= 40
        n_after = compact_dataset(
            spark, f"{TMP}/frag", f"{TMP}/compact", target_file_bytes=10**9
        )
        assert n_after <= 2
        # content preserved
        a = spark.read.parquet(f"{TMP}/frag").groupBy().sum("id", "v").collect()
        b = spark.read.parquet(f"{TMP}/compact").groupBy().sum("id", "v").collect()
        assert a == b


class TestTopNPerGroup:
    """The salted two-stage per-group cap must equal the naive single
    window exactly — including under heavy key skew and tie-dense
    orderings."""

    def _naive(self, df, group, order, n):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(*group).orderBy(*order)
        return (
            df.withColumn("cap_rank", F.row_number().over(w))
            .filter(F.col("cap_rank") <= n)
        )

    def test_equals_single_window_skewed(self, spark):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.operators.sampling import top_n_per_group

        # one hot group (900 rows), several cold ones, duplicate scores
        rows = [("hot", i, float(i % 7)) for i in range(900)] + [
            (f"g{i % 5}", i, float(i % 3)) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "grp string, id long, score double")
        order = (F.col("score").desc(), F.col("id").asc())
        got = top_n_per_group(
            df, ("grp",), order, n=10, salt_col="id", num_salts=8
        )
        want = self._naive(df, ("grp",), order, 10)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_cap_smaller_than_salts(self, spark):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.operators.sampling import top_n_per_group

        rows = [("a", i, float(i)) for i in range(50)]
        df = spark.createDataFrame(rows, "grp string, id long, score double")
        order = (F.col("score").desc(), F.col("id").asc())
        got = top_n_per_group(df, ("grp",), order, n=1, salt_col="id")
        assert [r.id for r in got.collect()] == [49]


class TestSortedExport:
    def test_files_hold_disjoint_ordered_ranges(self, spark, tmp_path):
        import glob
        import os

        import pyarrow.parquet as pq

        from pandas_to_postgres_spark.sinks.files import write_sorted
        from pandas_to_postgres_spark.sources.parquet import load_table

        out = str(tmp_path / "sorted")
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        write_sorted(li, out, ["l_orderkey"], num_files=4)
        parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
        assert len(parts) >= 2  # range partitioner actually split
        ranges = []
        total = 0
        for p in parts:
            t = pq.read_table(p, columns=["l_orderkey"])
            col = t.column("l_orderkey").to_pylist()
            total += len(col)
            assert col == sorted(col)  # sorted within the file
            if col:
                ranges.append((col[0], col[-1]))
        # disjoint, ascending ranges across files in part order ⇒ reading
        # part files in order yields the global order
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 <= b0
        assert total == li.count()


class TestDynamicPartitionOverwrite:
    def test_rerun_replaces_only_its_partitions(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.sinks.files import overwrite_partitions
        from pandas_to_postgres_spark.sources.parquet import load_table

        out = str(tmp_path / "daily")
        ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_id", "value", F.to_date("ts").cast("string").alias("day")
        )
        overwrite_partitions(ev, out, ["day"])
        before = spark.read.parquet(out)
        n_days = before.select("day").distinct().count()
        total = before.count()
        one_day = before.select("day").orderBy("day").first()["day"]
        n_day_before = before.filter(F.col("day") == one_day).count()

        # re-run ONE day with modified rows: only that day changes
        redo = ev.filter(F.col("day") == one_day).withColumn(
            "value", F.lit(-1.0)
        )
        overwrite_partitions(redo, out, ["day"])
        after = spark.read.parquet(out)
        assert after.count() == total
        assert after.select("day").distinct().count() == n_days
        day_rows = after.filter(F.col("day") == one_day)
        assert day_rows.count() == n_day_before
        assert day_rows.filter(F.col("value") != -1.0).count() == 0
        assert after.filter((F.col("day") != one_day) & (F.col("value") == -1.0)).count() == 0
        # writer-scoped option: the session conf is never touched
        assert (
            spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "STATIC"
            ).upper()
            == "STATIC"
        )


class TestMortonLayout:
    def test_key_matches_python_reference(self, spark):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.functions.vectors import morton_key_expr

        def py_morton(a, b, bits=16):
            k = 0
            for i in range(bits):
                k |= ((a >> i) & 1) << (2 * i + 1)
                k |= ((b >> i) & 1) << (2 * i)
            return k

        rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1000)]
        df = spark.createDataFrame(rows, "a long, b long").withColumn(
            "k", morton_key_expr(F.col("a"), F.col("b"))
        )
        for r in df.collect():
            assert r["k"] == py_morton(r["a"], r["b"]), (r["a"], r["b"])

    def test_zorder_write_clusters_both_dimensions(self, spark, tmp_path):
        import glob
        import os

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.functions.vectors import morton_key_expr
        from pandas_to_postgres_spark.sinks.files import write_sorted

        # balanced 64x64 grid (the operator's documented precondition:
        # dimensions pre-scaled to comparable bit widths — an unbalanced
        # pair lets the wider dimension's high bits dominate every split)
        out = str(tmp_path / "zorder")
        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
        )
        df = grid.withColumn(
            "zkey", morton_key_expr(F.col("x"), F.col("y"), bits=6)
        )
        write_sorted(df, out, ["zkey"], num_files=16)
        parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
        assert len(parts) >= 8
        # per-file min/max span of BOTH dims shrinks vs the global span
        # (63) — that per-file tightness is what row-group/file skipping
        # prunes on; a single-column sort only clusters its leading key
        for col in ("x", "y"):
            spans = []
            for p in parts:
                v = pq.read_table(p, columns=[col]).column(col).to_pylist()
                spans.append(max(v) - min(v))
            avg_span = sum(spans) / len(spans)
            assert avg_span <= 32, (col, spans)


class TestManifestPruning:
    """File-level data skipping: footer-harvested manifest + pruned reads."""

    def _write(self, spark, n_files=8):
        from pandas_to_postgres_spark.sinks.files import write_sorted
        from pandas_to_postgres_spark.sources.manifest import write_manifest

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        write_sorted(li, TMP, ["l_orderkey"], num_files=n_files)
        manifest = write_manifest(TMP, ["l_orderkey", "l_quantity"])
        return li, manifest

    def test_pruned_read_equals_full_filter_and_skips_files(self, spark):
        from pandas_to_postgres_spark.sources.manifest import (
            prune_files,
            read_pruned,
        )

        li, manifest = self._write(spark)
        keys = sorted(r[0] for r in li.select("l_orderkey").distinct().collect())
        lo, hi = keys[2], keys[min(10, len(keys) - 1)]
        keep, total = prune_files(manifest, "l_orderkey", lo, hi)
        # sorted layout => a narrow range survives in few files
        assert total == 8 and 0 < len(keep) < total
        got = read_pruned(spark, TMP, "l_orderkey", lo, hi)
        want = li.filter((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi))
        assert got.count() == want.count() > 0
        assert (
            sorted(r[0] for r in got.select("l_orderkey").collect())
            == sorted(r[0] for r in want.select("l_orderkey").collect())
        )

    def test_unknown_column_is_conservative(self, spark):
        from pandas_to_postgres_spark.sources.manifest import prune_files

        _, manifest = self._write(spark)
        keep, total = prune_files(manifest, "no_such_col", 0, 1)
        assert len(keep) == total  # no stats -> keep everything

    def test_empty_survivor_set_returns_typed_empty_frame(self, spark):
        from pandas_to_postgres_spark.sources.manifest import read_pruned

        li, _ = self._write(spark)
        got = read_pruned(spark, TMP, "l_orderkey", -10, -5)
        assert got.count() == 0
        assert got.schema == spark.read.parquet(TMP).schema

    def test_unsorted_layout_still_correct(self, spark):
        from pandas_to_postgres_spark.sources.manifest import (
            read_pruned,
            write_manifest,
        )

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        li.repartition(6).write.mode("overwrite").parquet(TMP)
        write_manifest(TMP, ["l_orderkey"])
        keys = sorted(r[0] for r in li.select("l_orderkey").distinct().collect())
        lo, hi = keys[0], keys[3]
        got = read_pruned(spark, TMP, "l_orderkey", lo, hi)
        want = li.filter((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi))
        assert got.count() == want.count() > 0


class TestObservedWrite:
    def test_metrics_match_without_second_scan(self, spark):
        from pandas_to_postgres_spark.sinks.files import write_parquet_observed

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, None), (4, "d")], "id long, v string"
        )
        got = write_parquet_observed(df, TMP, null_cols=["v"])
        assert got == {"rows": 4, "nulls_v": 2}
        # the write really happened and holds the same rows
        assert spark.read.parquet(TMP).count() == 4


class TestSnapshots:
    """Snapshot isolation + time travel + explicit expiry on the manifest
    source (the Iceberg contract minus the multi-writer log)."""

    def _publish_two(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import publish_snapshot

        path = str(tmp_path / "tbl")
        base = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        base.coalesce(2).write.mode("overwrite").parquet(path)
        publish_snapshot(path, ["k"])
        extra = spark.range(100, 150).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        extra.coalesce(1).write.mode("append").parquet(path)
        publish_snapshot(path, ["k"])
        return path

    def test_time_travel_reads_are_isolated(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            read_snapshot,
            snapshot_versions,
        )

        path = self._publish_two(spark, tmp_path)
        assert snapshot_versions(path) == [1, 2]
        assert read_snapshot(spark, path, version=1).count() == 100
        assert read_snapshot(spark, path, version=2).count() == 150
        assert read_snapshot(spark, path).count() == 150  # latest
        # v1 stays frozen even though newer part files sit in the dir
        v1_max = read_snapshot(spark, path, version=1).agg({"k": "max"}).first()[0]
        assert v1_max == 99

    def test_snapshot_pruning_keeps_superset_guarantee(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            read_snapshot_pruned,
        )

        path = self._publish_two(spark, tmp_path)
        got = read_snapshot_pruned(spark, path, "k", 120, 130, version=2)
        assert got.count() == 11
        # same range against v1 (appended keys absent there)
        assert read_snapshot_pruned(spark, path, "k", 120, 130, version=1).count() == 0

    def test_expire_deletes_only_unreferenced_files(self, spark, tmp_path):
        import os

        from pandas_to_postgres_spark.sources.manifest import (
            expire_snapshots,
            read_snapshot,
            snapshot_versions,
        )

        path = self._publish_two(spark, tmp_path)
        res = expire_snapshots(path, keep_latest=1)
        assert res["expired_versions"] == [1]
        # v2 references every file (append-only history) -> nothing deleted
        assert res["deleted_files"] == []
        assert snapshot_versions(path) == [2]
        assert read_snapshot(spark, path).count() == 150
        # now simulate a rewrite: new compacted file + publish, then expire
        read_snapshot(spark, path).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "compacted")
        )
        # drop the old parts by overwriting the dir with the compacted copy
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                os.remove(os.path.join(path, f))
        for f in os.listdir(str(tmp_path / "compacted")):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(str(tmp_path / "compacted"), f),
                    os.path.join(path, "compacted-" + f),
                )
        from pandas_to_postgres_spark.sources.manifest import publish_snapshot

        publish_snapshot(path, ["k"])
        res2 = expire_snapshots(path, keep_latest=1)
        assert res2["expired_versions"] == [2]
        assert read_snapshot(spark, path).count() == 150

    def test_expire_older_than_age_gates_and_count_floor_holds(
        self, spark, tmp_path
    ):
        """Iceberg's primary retention knob: ``older_than`` expires only
        versions published before the cutoff; younger versions are
        retained regardless of count, and ``keep_latest`` newest are
        retained regardless of age — both protect, neither expires."""
        import json
        import os

        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import (
            append_snapshot,
            expire_snapshots,
            snapshot_versions,
        )

        path = self._publish_two(spark, tmp_path)  # v1, v2
        extra = spark.range(150, 160).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        extra.coalesce(1).write.mode("append").parquet(path)
        known = set()
        for v in snapshot_versions(path):
            m = json.load(open(os.path.join(path, f"_manifest-v{v}.json")))
            known.update(e["path"] for e in m["files"])
        append_snapshot(path, sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in known
        ))  # v3
        # pin deterministic publish times: v1@100, v2@200, v3@300
        for v, ts in ((1, 100.0), (2, 200.0), (3, 300.0)):
            p = os.path.join(path, f"_manifest-v{v}.json")
            m = json.load(open(p))
            m["ts"] = ts
            json.dump(m, open(p, "w"))
        # age alone can't breach the count floor: everything younger than
        # the cutoff is also in keep_latest=3 -> no-op
        assert expire_snapshots(
            path, keep_latest=3, older_than=250.0
        )["expired_versions"] == []
        # cutoff at 250 expires v1+v2, retains the young v3
        res = expire_snapshots(path, keep_latest=1, older_than=250.0)
        assert res["expired_versions"] == [1, 2]
        assert snapshot_versions(path) == [3]
        # count floor protects even an infinitely old table
        path2 = self._publish_two(spark, tmp_path / "again")
        assert expire_snapshots(
            path2, keep_latest=2, older_than=1e18
        )["expired_versions"] == []


class TestSnapshotExpiryRace:
    def test_expire_never_deletes_unpublished_appends(self, spark, tmp_path):
        # a writer's freshly-appended (not yet published) files must
        # survive expiry — the Iceberg remove_orphan_files race
        import os

        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import (
            expire_snapshots,
            publish_snapshot,
            read_snapshot,
        )

        path = str(tmp_path / "tbl")
        spark.range(10).select(F.col("id").alias("k")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        publish_snapshot(path, ["k"])
        publish_snapshot(path, ["k"])  # v2, same files
        # unpublished append lands AFTER the last publish
        spark.range(10, 20).select(F.col("id").alias("k")).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        before = {f for f in os.listdir(path) if f.endswith(".parquet")}
        res = expire_snapshots(path, keep_latest=1)
        after = {f for f in os.listdir(path) if f.endswith(".parquet")}
        assert res["deleted_files"] == []
        assert after == before  # nothing deleted, append intact
        assert read_snapshot(spark, path).count() == 10  # v2 unchanged


class TestCompaction:
    """compact_snapshot: the OPTIMIZE leg of the manifest-source
    maintenance contract (publish = append, compact = rewrite small
    files, expire = reclaim)."""

    def _published(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import publish_snapshot

        path = str(tmp_path / "ctbl")
        base = spark.range(200).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        base.repartition(6).write.mode("overwrite").parquet(path)
        publish_snapshot(path, ["k"])
        return path

    def test_compaction_preserves_content_and_versions(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            compact_snapshot,
            load_snapshot,
            read_snapshot,
            snapshot_versions,
        )

        path = self._published(spark, tmp_path)
        assert len(load_snapshot(path, 1)["files"]) == 6
        man = compact_snapshot(spark, path)
        assert man["version"] == 2 and snapshot_versions(path) == [1, 2]
        # rewritten into one ~target-sized file, content bit-identical
        assert len(man["files"]) == 1
        got = sorted(tuple(r) for r in read_snapshot(spark, path, 2).collect())
        want = sorted(tuple(r) for r in read_snapshot(spark, path, 1).collect())
        assert got == want and len(got) == 200
        # old snapshot still time-travels over its original files
        assert read_snapshot(spark, path, 1).count() == 200

    def test_compacted_snapshot_still_prunes(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            compact_snapshot,
            read_snapshot_pruned,
        )

        path = self._published(spark, tmp_path)
        compact_snapshot(spark, path)
        got = read_snapshot_pruned(spark, path, "k", 50, 60, version=2)
        assert got.count() == 11

    def test_expire_reclaims_precompaction_files(self, spark, tmp_path):
        import os

        from pandas_to_postgres_spark.sources.manifest import (
            compact_snapshot,
            expire_snapshots,
            read_snapshot,
        )

        path = self._published(spark, tmp_path)
        compact_snapshot(spark, path)
        res = expire_snapshots(path, keep_latest=1)
        assert res["expired_versions"] == [1]
        # all six original small files reclaimed; the compacted file serves
        assert len(res["deleted_files"]) == 6
        assert read_snapshot(spark, path).count() == 200
        remaining = [
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        assert remaining == [p for p in remaining if p.startswith("part-c")]

    def test_multiple_output_files_when_target_small(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            compact_snapshot,
            read_snapshot,
        )

        path = self._published(spark, tmp_path)
        man = compact_snapshot(spark, path, target_bytes=2000)
        assert len(man["files"]) >= 2
        assert read_snapshot(spark, path, man["version"]).count() == 200


class TestSnapshotDataSource:
    """format('snapshot'): time travel through the standard reader API +
    planning-time file pruning from manifest stats."""

    def _table(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import publish_snapshot

        path = str(tmp_path / "dstbl")
        base = spark.range(300).select(
            F.col("id").alias("k"), (F.col("id") * 5).alias("v")
        )
        # range-partitioned files -> narrow per-file k envelopes, so the
        # pruning assertions below are meaningful
        base.repartitionByRange(3, "k").write.mode("overwrite").parquet(path)
        publish_snapshot(path, ["k"])
        extra = spark.range(300, 400).select(
            F.col("id").alias("k"), (F.col("id") * 5).alias("v")
        )
        extra.coalesce(1).write.mode("append").parquet(path)
        publish_snapshot(path, ["k"])
        return path

    def test_reads_latest_and_time_travels(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        path = self._table(spark, tmp_path)
        spark.dataSource.register(SnapshotDataSource)
        latest = spark.read.format("snapshot").option("path", path).load()
        assert latest.count() == 400
        v1 = (
            spark.read.format("snapshot")
            .option("path", path)
            .option("version", 1)
            .load()
        )
        assert v1.count() == 300
        assert v1.agg({"k": "max"}).first()[0] == 299
        # values, not just counts
        got = sorted(r["v"] for r in v1.filter("k < 3").collect())
        assert got == [0, 5, 10]

    def test_pushfilters_prunes_files_superset_safe(self, spark, tmp_path):
        from pyspark.sql.datasource import GreaterThan, LessThanOrEqual

        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotReader,
        )

        path = self._table(spark, tmp_path)
        r = SnapshotReader({"path": path, "version": "2"}, ["k", "v"])
        # no filters: one partition per manifest file (3 range + 1 append)
        assert len(r.partitions()) == 4
        # every filter must be yielded back (superset guarantee)
        back = list(r.pushFilters([GreaterThan(("k",), 310)]))
        assert len(back) == 1
        parts = r.partitions()
        # only the appended file (k in [300, 400)) can match
        assert len(parts) == 1 and "part-" in parts[0].value[0]
        r2 = SnapshotReader({"path": path, "version": "2"}, ["k", "v"])
        list(r2.pushFilters([LessThanOrEqual(("k",), 50)]))
        assert len(r2.partitions()) == 1  # first range file only
        # contradictory range -> all files pruned -> the empty sentinel
        r3 = SnapshotReader({"path": path, "version": "2"}, ["k", "v"])
        list(r3.pushFilters([GreaterThan(("k",), 500)]))
        parts3 = r3.partitions()
        assert len(parts3) == 1 and parts3[0].value is None
        assert list(r3.read(parts3[0])) == []

    def test_multi_version_read_matches_per_version_reads(
        self, spark, tmp_path
    ):
        """r11: option('versions', '1,2') reads several versions in ONE
        DataSource read (one planning-worker spawn per planning call),
        tagging rows with _snapshot_version — per-version aggregates must
        equal the individual version reads'."""
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        path = self._table(spark, tmp_path)
        spark.dataSource.register(SnapshotDataSource)
        multi = (
            spark.read.format("snapshot")
            .option("path", path)
            .option("versions", "1,2")
            .load()
        )
        assert multi.columns[-1] == "_snapshot_version"
        got = {
            int(r["_snapshot_version"]): (r["n"], r["s"], r["mx"])
            for r in multi.groupBy("_snapshot_version")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("s"),
                F.max("k").alias("mx"),
            )
            .collect()
        }
        for v in (1, 2):
            one = (
                spark.read.format("snapshot")
                .option("path", path)
                .option("version", v)
                .load()
            )
            row = one.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("s"),
                F.max("k").alias("mx"),
            ).first()
            assert got[v] == (row["n"], row["s"], row["mx"])

    def test_versions_option_excludes_single_version_options(
        self, spark, tmp_path
    ):
        import pytest

        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            _resolve_version,
        )

        with pytest.raises(ValueError, match="excludes"):
            _resolve_version(
                {"path": "x", "versions": "1,2", "version": "1"}
            )

    def test_e2e_pushdown_results_match_plain_read(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        path = self._table(spark, tmp_path)
        spark.dataSource.register(SnapshotDataSource)
        conf = "spark.sql.python.filterPushdown.enabled"
        old = spark.conf.get(conf, None)
        spark.conf.set(conf, "true")
        try:
            pushed = (
                spark.read.format("snapshot")
                .option("path", path)
                .option("pushdown", "true")
                .load()
                .filter("k >= 310 AND k <= 320")
            )
            rows = sorted((r["k"], r["v"]) for r in pushed.collect())
        finally:
            if old is None:
                spark.conf.unset(conf)
            else:
                spark.conf.set(conf, old)
        assert rows == [(k, k * 5) for k in range(310, 321)]


class TestSnapshotDataSourceWriter:
    """df.write.format('snapshot'): staged part files, one atomic publish
    per write; append stacks versions, overwrite is LOGICAL (prior
    versions keep time-traveling)."""

    def test_append_writes_stack_versions(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import (
            read_snapshot,
            snapshot_versions,
        )
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        spark.dataSource.register(SnapshotDataSource)
        path = str(tmp_path / "wtbl")
        a = spark.range(100).select(F.col("id").alias("k"))
        (a.write.format("snapshot").mode("append")
         .option("path", path).option("statCols", "k").save())
        assert snapshot_versions(path) == [1]
        b = spark.range(100, 150).select(F.col("id").alias("k"))
        (b.write.format("snapshot").mode("append")
         .option("path", path).option("statCols", "k").save())
        assert snapshot_versions(path) == [1, 2]
        assert read_snapshot(spark, path, 1).count() == 100
        assert read_snapshot(spark, path, 2).count() == 150
        # round-trip through the reader half too
        got = (spark.read.format("snapshot").option("path", path)
               .option("version", 2).load())
        assert got.agg({"k": "max"}).first()[0] == 149

    def test_overwrite_is_logical(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import (
            load_snapshot,
            read_snapshot,
        )
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        spark.dataSource.register(SnapshotDataSource)
        path = str(tmp_path / "wtbl2")
        a = spark.range(60).select(F.col("id").alias("k"))
        (a.write.format("snapshot").mode("append")
         .option("path", path).save())
        c = spark.range(500, 510).select(F.col("id").alias("k"))
        (c.write.format("snapshot").mode("overwrite")
         .option("path", path).save())
        # latest sees only the overwrite; v1 still serves the old rows
        assert read_snapshot(spark, path).count() == 10
        assert read_snapshot(spark, path, 1).count() == 60
        v2 = load_snapshot(path, 2)
        assert all(e["path"].startswith("part-w") for e in v2["files"])


class TestSnapshotChangeFeed:
    """readStream.format('snapshot'): version numbers as offsets — each
    publish is a micro-batch of its newly-added files."""

    def _drain(self, spark, path, out, ckpt):
        from pandas_to_postgres_spark.streaming.sink import (
            stream_to_batch_sink,
        )

        stream = (
            spark.readStream.format("snapshot")
            .option("path", path)
            .load()
        )

        def writer(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = stream_to_batch_sink(stream, writer, checkpoint_dir=ckpt)
        q.awaitTermination()

    def test_publishes_become_incremental_microbatches(self, spark, tmp_path):
        import os

        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import publish_snapshot
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        spark.dataSource.register(SnapshotDataSource)
        path = str(tmp_path / "cftbl")
        out = str(tmp_path / "cfout")
        ckpt = str(tmp_path / "cfckpt")
        spark.range(30).select(F.col("id").alias("k"), F.lit(1).alias("v")) \
            .coalesce(1).write.mode("overwrite").parquet(path)
        publish_snapshot(path, ["k"])

        self._drain(spark, path, out, ckpt)
        assert spark.read.parquet(out).count() == 30

        # append + publish -> ONLY the delta arrives on the next drain
        spark.range(30, 45).select(
            F.col("id").alias("k"), F.lit(2).alias("v")
        ).coalesce(1).write.mode("append").parquet(path)
        publish_snapshot(path, ["k"])
        self._drain(spark, path, out, ckpt)
        back = spark.read.parquet(out)
        assert back.count() == 45
        delta = back.filter("k >= 30")
        assert delta.count() == 15 and delta.agg({"v": "min"}).first()[0] == 2

        # idle poll: no new version -> no new rows
        self._drain(spark, path, out, ckpt)
        assert spark.read.parquet(out).count() == 45
        assert os.path.isdir(ckpt)


class TestSnapshotConcurrentPublish:
    """Round-7: the manifest log's optimistic commit. Three write paths
    (batch writer, stream ingest, compaction) share `_manifest-v{N}.json`;
    the version number is claimed ATOMICALLY (hard-link of a fully-written
    temp manifest — the loser's link raises FileExistsError) and a loser
    re-reads the new head and retries against it, so concurrent publishes
    both survive, in order, with no file list lost."""

    @staticmethod
    def _mkparquet(path, name, lo, hi):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"k": list(range(lo, hi))}), os.path.join(path, name)
        )

    def _base(self, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "tbl")
        os.makedirs(path)
        self._mkparquet(path, "part-base.parquet", 0, 10)
        M.publish_snapshot(path, ["k"], files=["part-base.parquet"])
        return path

    def test_two_threads_publish_both_versions_survive(self, tmp_path):
        import threading

        from pandas_to_postgres_spark.sources import manifest as M

        path = self._base(tmp_path)
        self._mkparquet(path, "part-a.parquet", 10, 20)
        self._mkparquet(path, "part-b.parquet", 20, 30)
        barrier = threading.Barrier(2)
        errs = []

        def run(name):
            try:
                barrier.wait()
                M.append_snapshot(path, [name])
            except Exception as e:  # pragma: no cover - diagnostic
                errs.append(e)

        ts = [
            threading.Thread(target=run, args=(n,))
            for n in ("part-a.parquet", "part-b.parquet")
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        assert M.snapshot_versions(path) == [1, 2, 3]
        head = M.load_snapshot(path)
        assert {e["path"] for e in head["files"]} == {
            "part-base.parquet", "part-a.parquet", "part-b.parquet"
        }
        # the intermediate version froze exactly one of the two appends
        mid = {e["path"] for e in M.load_snapshot(path, 2)["files"]}
        assert mid in (
            {"part-base.parquet", "part-a.parquet"},
            {"part-base.parquet", "part-b.parquet"},
        )
        # stat basis inherited by both appends; every entry has stats
        assert head["stat_cols"] == ["k"]
        assert all("k" in e["stats"] for e in head["files"])

    def test_lost_claim_remerges_against_new_head(self, tmp_path, monkeypatch):
        """Deterministic collision: another writer publishes BETWEEN our
        head read and our claim — the claim must lose, re-read, and the
        retry must include the interloper's file."""
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._base(tmp_path)
        self._mkparquet(path, "part-x.parquet", 10, 20)  # interloper's
        self._mkparquet(path, "part-y.parquet", 20, 30)  # appender's
        real = M._claim_version
        state = {"injected": False}

        def racy(p, version, man):
            if not state["injected"]:
                state["injected"] = True
                head = M.load_snapshot(p)
                other = {
                    "version": version,
                    "stat_cols": ["k"],
                    "files": M._build_entries(
                        p,
                        [e["path"] for e in head["files"]]
                        + ["part-x.parquet"],
                        ["k"],
                        head["files"],
                    ),
                }
                assert real(p, version, other)  # interloper wins the claim
            return real(p, version, man)

        monkeypatch.setattr(M, "_claim_version", racy)
        M.append_snapshot(path, ["part-y.parquet"])
        head = M.load_snapshot(path)
        assert head["version"] == 3
        assert {e["path"] for e in head["files"]} == {
            "part-base.parquet", "part-x.parquet", "part-y.parquet"
        }

    def test_compaction_racing_append_keeps_the_append(
        self, spark, tmp_path, monkeypatch
    ):
        """Round-7 verdict #2 'done' criterion: compaction racing an
        append either wins cleanly or retries — the append's file must
        survive the compacted snapshot."""
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "ctbl")
        base = spark.range(200).select(F.col("id").alias("k"))
        base.repartition(6).write.mode("overwrite").parquet(path)
        M.publish_snapshot(path, ["k"])
        self._mkparquet(path, "part-late.parquet", 1000, 1010)
        real = M._claim_version
        state = {"injected": False}

        def racy(p, version, man):
            if not state["injected"]:
                state["injected"] = True
                M.append_snapshot(p, ["part-late.parquet"])  # append wins
            return real(p, version, man)

        monkeypatch.setattr(M, "_claim_version", racy)
        man = M.compact_snapshot(spark, path)
        names = {e["path"] for e in man["files"]}
        assert "part-late.parquet" in names  # append survived
        assert not any(n.startswith("part-0") for n in names)  # sources gone
        assert M.read_snapshot(spark, path).count() == 210
        # and the pre-race snapshots still time-travel
        assert M.read_snapshot(spark, path, 1).count() == 200

    def test_append_reuses_head_entries_and_inherits_stat_cols(
        self, tmp_path, monkeypatch
    ):
        """ADVICE r6: an un-optioned append must not degrade pruning
        (stat_cols inherit from the head) and must not re-read O(table)
        parquet footers (head entries are reused — files are immutable)."""
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._base(tmp_path)
        for i in range(4):
            self._mkparquet(path, f"part-old{i}.parquet", i * 10, i * 10 + 10)
        M.append_snapshot(
            path, [f"part-old{i}.parquet" for i in range(4)]
        )  # v2: 5 files
        self._mkparquet(path, "part-new.parquet", 50, 60)
        calls = []
        real = M._file_stats

        def counting(pq_path, stat_cols):
            calls.append(os.path.basename(pq_path))
            return real(pq_path, stat_cols)

        monkeypatch.setattr(M, "_file_stats", counting)
        head = M.append_snapshot(path, ["part-new.parquet"])
        assert calls == ["part-new.parquet"]  # O(new), not O(table)
        assert head["stat_cols"] == ["k"]  # inherited, not dropped
        assert len(head["files"]) == 6
        assert all("k" in e["stats"] for e in head["files"])


class TestSnapshotStreamMaintenanceCompose:
    """ADVICE r6 (medium): the streaming epoch publish must build on the
    HEAD file list, never the raw directory listing — otherwise the next
    epoch resurrects compaction-superseded and logically-overwritten
    files (duplicate rows) and leaks crashed writers' orphans."""

    def test_epochs_compose_with_compaction_orphans_and_replay(
        self, spark, tmp_path
    ):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources import manifest as M
        from pandas_to_postgres_spark.streaming.sink import (
            snapshot_table_writer,
        )

        path = str(tmp_path / "stbl")
        w = snapshot_table_writer(path, ["k"])

        def df(lo, hi):
            return spark.range(lo, hi).select(F.col("id").alias("k"))

        w(df(0, 100), 0)    # v1
        w(df(100, 200), 1)  # v2
        M.compact_snapshot(spark, path)  # v3: part-c files; part-e0/e1
        #                                  stay ON DISK for time travel
        # a crashed batch writer's orphan: referenced by no snapshot
        with open(os.path.join(path, "part-worphan-0.parquet"), "wb") as fh:
            fh.write(b"not really parquet")
        w(df(200, 250), 2)  # v4 — the old raw-listing publish would have
        #                     resurrected part-e0/e1 (duplicates) + orphan
        head = M.load_snapshot(path)
        names = {e["path"] for e in head["files"]}
        assert not any(
            n.startswith(("part-e0-", "part-e1-", "part-worphan"))
            for n in names
        )
        got = M.read_snapshot(spark, path)
        assert got.count() == 250  # no duplicates
        assert got.select("k").distinct().count() == 250
        # epoch REPLAY (same batch_id redelivered) replaces, not appends
        w(df(200, 250), 2)  # redelivery of epoch 2
        head2 = M.read_snapshot(spark, path)
        assert head2.count() == 250
        assert head2.select("k").distinct().count() == 250
        # compaction-era snapshots still time-travel bit-exactly
        assert M.read_snapshot(spark, path, 2).count() == 200
        # stream epochs kept the stat basis -> pruning still works
        assert M.load_snapshot(path)["stat_cols"] == ["k"]
        assert (
            M.read_snapshot_pruned(spark, path, "k", 240, 249).count() == 10
        )

    def test_two_streams_one_table_namespaced_epochs(self, spark, tmp_path):
        """Epoch numbers are per-CHECKPOINT, not per table: two streams
        ingesting the same snapshot table both deliver batch 0. With
        distinct stream_ids their epoch namespaces cannot collide —
        stream B's batch-0 leftover sweep must not delete stream A's
        PUBLISHED batch-0 files, and each stream's redelivery replaces
        only its OWN epoch."""
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources import manifest as M
        from pandas_to_postgres_spark.streaming.sink import (
            snapshot_table_writer,
        )

        path = str(tmp_path / "shared_tbl")
        wa = snapshot_table_writer(path, ["k"], stream_id="aa")
        wb = snapshot_table_writer(path, ["k"], stream_id="bb")

        def df(lo, hi):
            return spark.range(lo, hi).select(F.col("id").alias("k"))

        wa(df(0, 100), 0)     # stream A, batch 0
        wb(df(100, 150), 0)   # stream B, batch 0 — same epoch NUMBER
        got = M.read_snapshot(spark, path)
        assert got.count() == 150  # A's batch-0 rows survived B's sweep
        assert got.select("k").distinct().count() == 150
        # each stream's redelivery replaces only its own epoch
        wa(df(0, 100), 0)
        wb(df(100, 150), 0)
        got2 = M.read_snapshot(spark, path)
        assert got2.count() == 150
        assert got2.select("k").distinct().count() == 150
        with pytest.raises(ValueError, match="stream_id"):
            snapshot_table_writer(path, ["k"], stream_id="../evil")


class TestSnapshotWriterStatColsInheritance:
    def test_unoptioned_append_keeps_pruning(self, spark, tmp_path):
        """ADVICE r6: df.write append without option('statCols') must
        inherit the head's stat columns — not silently publish an empty
        stats basis and degrade every future pruned read to a full scan."""
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import (
            load_snapshot,
            read_snapshot_pruned,
        )
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        spark.dataSource.register(SnapshotDataSource)
        path = str(tmp_path / "wtbl3")
        a = spark.range(100).select(F.col("id").alias("k"))
        (a.write.format("snapshot").mode("append")
         .option("path", path).option("statCols", "k").save())
        b = spark.range(100, 200).select(F.col("id").alias("k"))
        (b.write.format("snapshot").mode("append")
         .option("path", path).save())  # no statCols — must inherit
        head = load_snapshot(path)
        assert head["stat_cols"] == ["k"]
        assert all("k" in e["stats"] for e in head["files"])
        assert read_snapshot_pruned(spark, path, "k", 150, 159).count() == 10


class TestSnapshotChangeFeedRestartResume:
    """Round-7 verdict #7: the change-feed stream must resume DELTA-ONLY
    across a full driver restart — kill the query, publish more versions
    while nothing runs, then drain on the SAME checkpoint from a NEW
    SparkSession: only the in-between versions' rows may arrive."""

    @staticmethod
    def _register(sess):
        # Spark 4.1: registerPython's duplicate check is context-global
        # while resolution is session-scoped (see
        # test_postgres_integration.TestStreamRestartResume._register)
        from pyspark.sql.udf import _wrap_function

        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        try:
            sess.dataSource.register(SnapshotDataSource)
            return
        except Exception:
            pass
        sc = sess.sparkContext
        wrapped = _wrap_function(sc, SnapshotDataSource)
        jds = getattr(
            sc._jvm,
            "org.apache.spark.sql.execution.datasources"
            ".v2.python.UserDefinedPythonDataSource",
        )(wrapped)
        sess._jsparkSession.sessionState().dataSourceManager(
        ).registerDataSource("snapshot", jds)

    def _drain(self, sess, path, out, ckpt):
        from pandas_to_postgres_spark.streaming.sink import (
            stream_to_batch_sink,
        )

        self._register(sess)
        stream = (
            sess.readStream.format("snapshot").option("path", path).load()
        )

        def writer(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = stream_to_batch_sink(stream, writer, checkpoint_dir=ckpt)
        q.awaitTermination()

    def test_delta_only_across_new_session(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "feed")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def publish(lo, hi):
            (spark.range(lo, hi).select(F.col("id").alias("k"))
             .coalesce(1).write.mode("append").parquet(path))
            new = sorted(
                f for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            published = set()
            for v in M.snapshot_versions(path):
                published.update(
                    e["path"] for e in M.load_snapshot(path, v)["files"]
                )
            M.append_snapshot(
                path, [f for f in new if f not in published],
                stat_cols=["k"],
            )

        publish(0, 30)   # v1
        publish(30, 45)  # v2
        self._drain(spark, path, out, ckpt)  # session 1 consumes v1+v2
        assert spark.read.parquet(out).count() == 45
        # the "driver is down" window: two more versions land
        publish(45, 50)  # v3
        publish(50, 70)  # v4
        # resume on the SAME checkpoint from a NEW session
        sess2 = spark.newSession()
        self._drain(sess2, path, out, ckpt)
        got = spark.read.parquet(out)
        assert got.count() == 70  # 45 + exactly the 25 new rows
        assert got.select("k").distinct().count() == 70  # no replays


class TestSnapshotMerge:
    """merge_snapshot: copy-on-write upsert on the manifest log — only
    part files that CONTAIN a matched key are rewritten; everything else
    survives by name. Prior versions keep time-traveling."""

    @staticmethod
    def _mkfile(path, name, lo, hi):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "k": pa.array(range(lo, hi), type=pa.int64()),
                    "v": [f"old{i}" for i in range(lo, hi)],
                }
            ),
            os.path.join(path, name),
        )

    def _table(self, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "mtbl")
        os.makedirs(path)
        self._mkfile(path, "part-a.parquet", 0, 100)
        self._mkfile(path, "part-b.parquet", 100, 200)
        self._mkfile(path, "part-c.parquet", 200, 300)
        M.publish_snapshot(
            path, ["k"],
            files=["part-a.parquet", "part-b.parquet", "part-c.parquet"],
        )
        return path

    def test_update_insert_rewrites_only_touched_files(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        updates = spark.createDataFrame(
            [(50, "NEW50"), (1000, "NEW1000")], "k long, v string"
        )
        man = M.merge_snapshot(spark, path, updates, ["k"])
        names = {e["path"] for e in man["files"]}
        # untouched files survive BY NAME; only part-a was rewritten
        assert {"part-b.parquet", "part-c.parquet"} <= names
        assert "part-a.parquet" not in names
        assert any(n.startswith("part-m") for n in names)
        got = M.read_snapshot(spark, path)
        assert got.count() == 301  # 300 rows + 1 insert
        rows = {r.k: r.v for r in got.filter("k in (50, 51, 1000)").collect()}
        assert rows == {50: "NEW50", 51: "old51", 1000: "NEW1000"}
        # prior version is untouched (time travel)
        v1 = M.read_snapshot(spark, path, 1)
        assert v1.count() == 300
        assert v1.filter("k = 50").first().v == "old50"
        # stats basis carried over -> pruned reads still work
        assert man["stat_cols"] == ["k"]
        assert all("k" in e["stats"] for e in man["files"])

    def test_insert_only_touches_nothing(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        updates = spark.createDataFrame(
            [(5000, "x"), (5001, "y")], "k long, v string"
        )
        man = M.merge_snapshot(spark, path, updates, ["k"])
        names = {e["path"] for e in man["files"]}
        assert {"part-a.parquet", "part-b.parquet", "part-c.parquet"} <= names
        assert M.read_snapshot(spark, path).count() == 302

    def test_empty_updates_is_a_noop(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        empty = spark.createDataFrame([], "k long, v string")
        man = M.merge_snapshot(spark, path, empty, ["k"])
        assert man["version"] == 1  # no new version published
        assert M.snapshot_versions(path) == [1]

    def test_duplicate_keys_and_missing_columns_raise(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        dup = spark.createDataFrame(
            [(1, "a"), (1, "b")], "k long, v string"
        )
        with pytest.raises(ValueError, match="duplicate keys"):
            M.merge_snapshot(spark, path, dup, ["k"])
        narrow = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="missing table columns"):
            M.merge_snapshot(spark, path, narrow, ["k"])

    def test_merge_racing_append_keeps_the_append(
        self, spark, tmp_path, monkeypatch
    ):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        self._mkfile(path, "part-late.parquet", 9000, 9010)
        real = M._claim_version
        state = {"injected": False}

        def racy(p, version, man):
            if not state["injected"]:
                state["injected"] = True
                M.append_snapshot(p, ["part-late.parquet"])
            return real(p, version, man)

        monkeypatch.setattr(M, "_claim_version", racy)
        updates = spark.createDataFrame([(250, "NEW")], "k long, v string")
        man = M.merge_snapshot(spark, path, updates, ["k"])
        names = {e["path"] for e in man["files"]}
        assert "part-late.parquet" in names  # concurrent append survived
        assert "part-c.parquet" not in names  # the touched file rewritten
        got = M.read_snapshot(spark, path)
        assert got.count() == 310  # 300 + 10 appended
        assert got.filter("k = 250").first().v == "NEW"

    def test_cow_verbs_on_url_encodable_table_path(self, spark, tmp_path):
        """Spark reports ``_metadata.file_path`` as a URL-ENCODED URI (a
        space arrives as ``%20``) — the probe-to-entry mapping must
        percent-decode before matching, or every CoW verb silently
        no-ops on such paths (r9 ADVICE high: stale row left beside the
        update)."""
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "dir with space" / "m tbl")
        os.makedirs(path)
        self._mkfile(path, "part-a.parquet", 0, 100)
        self._mkfile(path, "part-b.parquet", 100, 200)
        M.publish_snapshot(path, ["k"], files=["part-a.parquet", "part-b.parquet"])
        updates = spark.createDataFrame([(50, "NEW50")], "k long, v string")
        man = M.merge_snapshot(spark, path, updates, ["k"])
        names = {e["path"] for e in man["files"]}
        assert "part-a.parquet" not in names  # touched file WAS rewritten
        assert "part-b.parquet" in names
        got = M.read_snapshot(spark, path)
        assert got.count() == 200  # no stale duplicate of k=50
        assert [r.v for r in got.filter("k = 50").collect()] == ["NEW50"]
        keys = spark.createDataFrame([(150,)], "k long")
        M.delete_snapshot_rows(spark, path, keys, ["k"])
        got = M.read_snapshot(spark, path)
        assert got.count() == 199
        assert got.filter("k = 150").count() == 0


class TestSnapshotDelete:
    """delete_snapshot_rows: copy-on-write DELETE — only files containing
    a doomed key are rewritten; fully-deleted files drop out; no-match
    deletes publish nothing."""

    def _table(self, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "dtbl")
        os.makedirs(path)
        TestSnapshotMerge._mkfile(path, "part-a.parquet", 0, 100)
        TestSnapshotMerge._mkfile(path, "part-b.parquet", 100, 200)
        TestSnapshotMerge._mkfile(path, "part-c.parquet", 200, 300)
        M.publish_snapshot(
            path, ["k"],
            files=["part-a.parquet", "part-b.parquet", "part-c.parquet"],
        )
        return path

    def test_delete_rewrites_only_touched_files(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        keys = spark.createDataFrame([(50,), (250,)], "k long")
        man = M.delete_snapshot_rows(spark, path, keys, ["k"])
        names = {e["path"] for e in man["files"]}
        assert "part-b.parquet" in names  # untouched by name
        assert "part-a.parquet" not in names and "part-c.parquet" not in names
        got = M.read_snapshot(spark, path)
        assert got.count() == 298
        assert got.filter("k in (50, 250)").count() == 0
        assert M.read_snapshot(spark, path, 1).count() == 300  # time travel

    def test_fully_deleted_file_drops_out(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        keys = spark.range(100, 200).select(F.col("id").alias("k"))
        man = M.delete_snapshot_rows(spark, path, keys, ["k"])
        names = {e["path"] for e in man["files"]}
        assert names == {"part-a.parquet", "part-c.parquet"}  # no empty part
        assert M.read_snapshot(spark, path).count() == 200

    def test_no_match_is_a_noop(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        keys = spark.createDataFrame([(99999,)], "k long")
        man = M.delete_snapshot_rows(spark, path, keys, ["k"])
        assert man["version"] == 1
        assert M.snapshot_versions(path) == [1]


class TestSnapshotCdcApply:
    """apply_changes_to_snapshot + snapshot_cdc_writer: an I/U/D feed
    folds to latest-per-key and lands as ONE version per batch — the
    lakehouse twin of apply_changes_to_postgres."""

    def test_batch_apply_last_change_wins(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "ctbl")
        os.makedirs(path)
        TestSnapshotMerge._mkfile(path, "part-a.parquet", 0, 100)
        M.publish_snapshot(path, ["k"], files=["part-a.parquet"])
        changes = spark.createDataFrame(
            [
                (1, 10, "X1", "U"),
                (2, 10, "X2", "U"),   # later seq wins for k=10
                (3, 20, None, "D"),   # delete k=20
                (4, 500, "NEW", "I"),  # insert
                (5, 30, None, "D"),   # deleted...
                (6, 30, "BACK", "I"),  # ...then re-inserted at higher seq
            ],
            "seq long, k long, v string, op string",
        )
        man = M.apply_changes_to_snapshot(spark, path, changes, ["k"])
        assert man["version"] == 2
        got = M.read_snapshot(spark, path)
        assert got.count() == 100  # 100 - 1 delete + 1 insert
        rows = {
            r.k: r.v for r in got.filter("k in (10, 20, 30, 500)").collect()
        }
        assert rows == {10: "X2", 30: "BACK", 500: "NEW"}  # 20 gone
        # content-idempotent: replaying the SAME batch leaves the table
        # identical (new version, same rows)
        M.apply_changes_to_snapshot(spark, path, changes, ["k"])
        again = M.read_snapshot(spark, path)
        assert again.count() == 100
        assert {
            r.k: r.v for r in again.filter("k in (10, 20, 30, 500)").collect()
        } == rows

    def test_streamed_cdc_feed_applies_exactly(self, spark, tmp_path):
        import time

        from pandas_to_postgres_spark.sources import manifest as M
        from pandas_to_postgres_spark.streaming.sink import (
            snapshot_cdc_writer,
            stream_to_batch_sink,
        )

        path = str(tmp_path / "stbl")
        feed = str(tmp_path / "feed")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(path)
        TestSnapshotMerge._mkfile(path, "part-a.parquet", 0, 50)
        M.publish_snapshot(path, ["k"], files=["part-a.parquet"])
        # two change files -> (at least) two micro-batches
        spark.createDataFrame(
            [(1, 5, "U5", "U"), (2, 60, "I60", "I")],
            "seq long, k long, v string, op string",
        ).coalesce(1).write.mode("overwrite").parquet(feed)
        spark.createDataFrame(
            [(3, 5, None, "D"), (4, 61, "I61", "I")],
            "seq long, k long, v string, op string",
        ).coalesce(1).write.mode("append").parquet(feed)
        stream = (
            spark.readStream.schema("seq long, k long, v string, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = stream_to_batch_sink(
            stream, snapshot_cdc_writer(path, ["k"]), checkpoint_dir=ckpt
        )
        q.awaitTermination(120)
        got = M.read_snapshot(spark, path)
        # 50 - k=5 deleted + k=60 + k=61 inserted = 51
        assert got.count() == 51
        assert got.filter("k = 5").count() == 0
        assert {r.k: r.v for r in got.filter("k >= 60").collect()} == {
            60: "I60", 61: "I61"
        }


class TestSortedCompaction:
    def test_sort_cols_restore_pruning(self, spark, tmp_path):
        """Clustered compaction (OPTIMIZE ... SORT BY): streaming-order
        appends scatter keys across every file, so a range predicate
        prunes nothing; a sorted compaction range-partitions on the key
        and each rewritten file owns a disjoint range — the same
        selective read then touches one file."""
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "sctbl")
        # 6 "epoch" files, each containing keys spread over the WHOLE
        # domain (k % 6 == i) — worst case for min/max pruning
        base = spark.range(600).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        )
        for i in range(6):
            base.filter(F.col("k") % 6 == i).coalesce(1).write.mode(
                "append"
            ).parquet(path)
        M.publish_snapshot(path, ["k"])
        pre, total_pre = M.prune_files(M.load_snapshot(path), "k", 100, 110)
        assert len(pre) == total_pre == 6  # nothing prunes: full scan
        man = M.compact_snapshot(
            spark, path, target_bytes=2048, sort_cols=["k"]
        )
        assert len(man["files"]) > 1  # actually split into ranges
        post, total_post = M.prune_files(man, "k", 100, 110)
        assert total_post == len(man["files"])
        assert len(post) <= 2  # disjoint ranges: O(1) files survive
        # content bit-exact vs the pre-compaction version
        got = sorted(tuple(r) for r in M.read_snapshot(spark, path).collect())
        want = sorted(
            tuple(r) for r in M.read_snapshot(spark, path, 1).collect()
        )
        assert got == want and len(got) == 600
        # pruned read returns exactly the predicate rows
        assert (
            M.read_snapshot_pruned(spark, path, "k", 100, 110).count() == 11
        )


class TestSnapshotSchemaEvolution:
    """ADD-COLUMN evolution: appends may carry a superset schema; merged
    reads union per-file schemas and null-fill what older files lack —
    through BOTH read paths (read_snapshot merge_schema and the
    format('snapshot') DataSource with option('mergeSchema'))."""

    def _evolved(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "evtbl")
        spark.createDataFrame(
            [(0, "a0"), (1, "a1")], "k long, v string"
        ).coalesce(1).write.mode("overwrite").parquet(path)
        M.publish_snapshot(path, ["k"])
        spark.createDataFrame(
            [(2, "b2", 20.5)], "k long, v string, score double"
        ).coalesce(1).write.mode("append").parquet(path)
        new = sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        v1 = {e["path"] for e in M.load_snapshot(path, 1)["files"]}
        M.append_snapshot(path, [f for f in new if f not in v1])
        return path

    def test_function_reader_merges(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._evolved(spark, tmp_path)
        got = M.read_snapshot(spark, path, merge_schema=True)
        assert set(got.columns) == {"k", "v", "score"}
        rows = {r.k: (r.v, r.score) for r in got.collect()}
        assert rows == {0: ("a0", None), 1: ("a1", None), 2: ("b2", 20.5)}
        # v1 still reads with exactly the schema it froze
        assert set(M.read_snapshot(spark, path, 1).columns) == {"k", "v"}

    def test_datasource_merges_and_streams(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )
        from pandas_to_postgres_spark.streaming.sink import (
            stream_to_batch_sink,
        )

        spark.dataSource.register(SnapshotDataSource)
        path = self._evolved(spark, tmp_path)
        got = (
            spark.read.format("snapshot")
            .option("path", path)
            .option("mergeSchema", "true")
            .load()
        )
        assert set(got.columns) == {"k", "v", "score"}
        rows = {r.k: (r.v, r.score) for r in got.collect()}
        assert rows == {0: ("a0", None), 1: ("a1", None), 2: ("b2", 20.5)}
        # default (no option): first-file schema, unchanged behavior —
        # which file sorts first depends on the writers' uuid part names,
        # so assert it is ONE of the file schemas, not the union logic
        plain = spark.read.format("snapshot").option("path", path).load()
        assert set(plain.columns) in ({"k", "v"}, {"k", "v", "score"})
        # change feed with the unified schema: old files null-fill too
        out = str(tmp_path / "out")
        stream = (
            spark.readStream.format("snapshot")
            .option("path", path)
            .option("mergeSchema", "true")
            .load()
        )

        def writer(batch_df, _bid):
            batch_df.write.mode("append").parquet(out)

        q = stream_to_batch_sink(
            stream, writer, checkpoint_dir=str(tmp_path / "ck")
        )
        q.awaitTermination(120)
        fed = spark.read.parquet(out)
        assert fed.count() == 3
        assert {r.k: r.score for r in fed.collect()} == {
            0: None, 1: None, 2: 20.5
        }


class TestVacuumOrphans:
    def test_deletes_only_old_unreferenced_files(self, tmp_path):
        """vacuum_orphans: referenced files and young orphans survive;
        old orphans and old temp files go."""
        import time

        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "vtbl")
        os.makedirs(path)
        TestSnapshotMerge._mkfile(path, "part-live.parquet", 0, 10)
        M.publish_snapshot(path, ["k"], files=["part-live.parquet"])
        # an OLD orphan (crashed writer), an old temp, and a YOUNG orphan
        TestSnapshotMerge._mkfile(path, "part-orphan.parquet", 10, 20)
        TestSnapshotMerge._mkfile(path, "part-fresh.parquet", 20, 30)
        with open(os.path.join(path, ".tmp-dead.parquet"), "wb") as fh:
            fh.write(b"x")
        old = time.time() - 10 * 24 * 3600
        os.utime(os.path.join(path, "part-orphan.parquet"), (old, old))
        os.utime(os.path.join(path, ".tmp-dead.parquet"), (old, old))
        res = M.vacuum_orphans(path, grace_seconds=3 * 24 * 3600)
        assert res["deleted_files"] == [".tmp-dead.parquet", "part-orphan.parquet"]
        assert res["kept_young_orphans"] == ["part-fresh.parquet"]
        left = set(os.listdir(path))
        assert "part-live.parquet" in left and "part-fresh.parquet" in left
        assert "part-orphan.parquet" not in left
        # manifests untouched, table still reads
        assert M.snapshot_versions(path) == [1]


class TestSnapshotLifecycleE2E:
    def test_full_maintenance_lifecycle_preserves_content(
        self, spark, tmp_path
    ):
        """The whole table lifecycle composed end-to-end: streaming
        epoch ingest → sorted compaction → MERGE → DELETE → expiry →
        orphan vacuum. Every step publishes through the same claim-
        arbitrated log; content stays exact throughout and the final
        directory holds only live data."""
        import time

        from pandas_to_postgres_spark.sources import manifest as M
        from pandas_to_postgres_spark.streaming.sink import (
            snapshot_table_writer,
        )

        path = str(tmp_path / "lc")
        w = snapshot_table_writer(path, ["k"])

        def df(lo, hi, tag):
            return spark.range(lo, hi).select(
                F.col("id").alias("k"),
                F.concat(F.lit(tag), F.col("id")).alias("v"),
            )

        w(df(0, 200, "e0-"), 0)    # v1
        w(df(200, 400, "e1-"), 1)  # v2
        M.compact_snapshot(spark, path, target_bytes=4096, sort_cols=["k"])
        # MERGE: update k in [0, 50), insert [400, 420)
        updates = df(0, 50, "m-").unionByName(df(400, 420, "m-"))
        M.merge_snapshot(spark, path, updates, ["k"])
        # DELETE: k in [100, 150)
        M.delete_snapshot_rows(
            spark, path, spark.range(100, 150).select(F.col("id").alias("k")),
            ["k"],
        )
        got = M.read_snapshot(spark, path)
        assert got.count() == 370  # 400 + 20 inserts - 50 deletes
        sample = {r.k: r.v for r in got.filter("k in (0, 99, 250, 410)").collect()}
        assert sample == {0: "m-0", 99: "e0-99", 250: "e1-250", 410: "m-410"}
        assert got.filter("k between 100 and 149").count() == 0
        head_v = M.load_snapshot(path)["version"]
        # reclaim: keep only the head, then vacuum everything unreferenced
        res = M.expire_snapshots(path, keep_latest=1)
        assert res["expired_versions"] == list(range(1, head_v))
        old = time.time() - 10 * 24 * 3600
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (old, old))
        M.vacuum_orphans(path, grace_seconds=24 * 3600)
        # after full reclaim: directory = live files + head manifest only
        live = {e["path"] for e in M.load_snapshot(path)["files"]}
        on_disk = {
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        }
        assert on_disk == live
        final = M.read_snapshot(spark, path)
        assert final.count() == 370
        assert {
            r.k: r.v for r in final.filter("k in (0, 99, 250, 410)").collect()
        } == sample


class TestIncrementalMV:
    def test_redelivered_batch_adds_nothing(self, spark, tmp_path):
        """The applied_batch stamp is the exactly-once state: replaying
        the same (batch_df, batch_id) must leave silver bit-identical,
        while the next batch_id still accumulates."""
        from pandas_to_postgres_spark.sources import manifest as M
        from pandas_to_postgres_spark.streaming.mv import (
            silver_rollup_writer,
        )

        silver = str(tmp_path / "silver")
        w = silver_rollup_writer(silver)
        b0 = spark.createDataFrame(
            [(1, "view", 1.25), (2, "view", 2.25), (3, "click", 10.0)],
            "event_id long, event_type string, value double",
        )
        w(b0, 0)
        w(b0, 0)  # redelivery of the SAME batch
        got = {
            r.event_type: (r.n, r.value_cents)
            for r in M.read_snapshot(spark, silver).collect()
        }
        assert got == {"view": (2, 350), "click": (1, 1000)}
        b1 = spark.createDataFrame(
            [(4, "view", 0.50), (5, "buy", 99.99)],
            "event_id long, event_type string, value double",
        )
        w(b1, 1)
        w(b1, 1)  # and redelivery of the next one
        got = {
            r.event_type: (r.n, r.value_cents)
            for r in M.read_snapshot(spark, silver).collect()
        }
        assert got == {"view": (3, 400), "click": (1, 1000), "buy": (1, 9999)}
        # every EFFECTIVE refresh is a time-travelable version —
        # redeliveries publish nothing at all (no version churn)
        assert len(M.snapshot_versions(silver)) == 2


class TestZOrderCompaction:
    def test_zorder_prunes_both_dimensions(self, spark, tmp_path):
        """Z-ordered compaction: after the rewrite, a selective range on
        EITHER column keeps a small fraction of the files — single-key
        sorting can only serve its leading column."""
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "ztbl")
        n = 4096
        base = spark.range(n).select(
            F.col("id").alias("x"),
            ((F.col("id") * 2654435761) % n).alias("y"),  # decorrelated
            (F.col("id") % 97).alias("payload"),
        )
        # arrival-order ingest: every file spans both full domains
        for i in range(6):
            base.filter(F.col("x") % 6 == i).coalesce(1).write.mode(
                "append"
            ).parquet(path)
        M.publish_snapshot(path, ["x", "y"])
        pre_x, tot = M.prune_files(M.load_snapshot(path), "x", 0, 255)
        pre_y, _ = M.prune_files(M.load_snapshot(path), "y", 0, 255)
        assert len(pre_x) == len(pre_y) == tot == 6  # nothing prunes
        total = sum(int(e["bytes"]) for e in M.load_snapshot(path)["files"])
        man = M.compact_snapshot(
            spark, path, target_bytes=max(1, total // 16),
            zorder_cols=["x", "y"],
        )
        nf = len(man["files"])
        assert nf >= 12  # genuinely split (≈ a 4x4 z-grid)
        post_x, _ = M.prune_files(man, "x", 0, 255)
        post_y, _ = M.prune_files(man, "y", 0, 255)
        # a 1/16-of-domain range on EITHER dimension keeps well under
        # half the files (a 4x4 z-grid keeps ~1 column/row of cells);
        # single-key sorting would serve only its leading column
        assert len(post_x) <= nf // 2 and len(post_y) <= nf // 2
        # content bit-exact; pruned reads return exactly the predicate rows
        got = sorted(tuple(r) for r in M.read_snapshot(spark, path).collect())
        want = sorted(
            tuple(r) for r in M.read_snapshot(spark, path, 1).collect()
        )
        assert got == want and len(got) == n
        assert M.read_snapshot_pruned(spark, path, "x", 0, 255).count() == 256
        assert M.read_snapshot_pruned(spark, path, "y", 0, 255).count() == 256

    def test_sort_and_zorder_are_exclusive(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "zx")
        spark.range(10).select(F.col("id").alias("x"), F.col("id").alias("y")) \
            .coalesce(1).write.mode("overwrite").parquet(path)
        M.publish_snapshot(path, ["x"])
        with pytest.raises(ValueError, match="not both"):
            M.compact_snapshot(
                spark, path, sort_cols=["x"], zorder_cols=["x", "y"]
            )
        with pytest.raises(ValueError, match="exactly two"):
            M.compact_snapshot(spark, path, zorder_cols=["x"])


class TestCountSnapshot:
    def test_metadata_count_matches_scan(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "cnt")
        os.makedirs(path)
        TestSnapshotMerge._mkfile(path, "part-a.parquet", 0, 70)
        TestSnapshotMerge._mkfile(path, "part-b.parquet", 70, 100)
        M.publish_snapshot(path, ["k"])
        assert M.count_snapshot(path) == 100
        assert M.count_snapshot(path) == M.read_snapshot(spark, path).count()
        # merges/deletes keep the count truthful per version
        M.delete_snapshot_rows(
            spark, path, spark.range(10).select(F.col("id").alias("k")), ["k"]
        )
        assert M.count_snapshot(path) == 90
        assert M.count_snapshot(path, version=1) == 100  # time travel

    def test_legacy_entries_without_rows_fall_back(self, tmp_path):
        import json as _json

        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "lg")
        os.makedirs(path)
        TestSnapshotMerge._mkfile(path, "part-a.parquet", 0, 25)
        M.publish_snapshot(path, ["k"])
        # simulate a pre-round-7 manifest: strip the rows field
        mf = os.path.join(path, "_manifest-v1.json")
        man = _json.load(open(mf))
        for e in man["files"]:
            e.pop("rows", None)
        _json.dump(man, open(mf, "w"))
        assert M.count_snapshot(path) == 25  # footer fallback


class TestChangeFeedDmlSemantics:
    """Delta-CDF semantics for the change feed now that the table has
    DML: compaction versions (data_change: false) emit nothing; a
    merge/delete version fails fast unless ignoreChanges accepts the
    re-emitted rewrites; per-version walking emits files added then
    merged away within one batch range."""

    def _drain(self, spark, path, out, ckpt, ignore_changes=False):
        from pandas_to_postgres_spark.streaming.sink import (
            stream_to_batch_sink,
        )

        r = spark.readStream.format("snapshot").option("path", path)
        if ignore_changes:
            r = r.option("ignoreChanges", "true")
        stream = r.load()

        def writer(batch_df, _bid):
            batch_df.write.mode("append").parquet(out)

        q = stream_to_batch_sink(stream, writer, checkpoint_dir=ckpt)
        q.awaitTermination(180)

    def test_compaction_emits_nothing(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        spark.dataSource.register(SnapshotDataSource)
        path = str(tmp_path / "t")
        out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
        os.makedirs(path)
        TestSnapshotMerge._mkfile(path, "part-a.parquet", 0, 40)
        M.publish_snapshot(path, ["k"])
        self._drain(spark, path, out, ckpt)
        assert spark.read.parquet(out).count() == 40
        M.compact_snapshot(spark, path)  # v2: data_change false
        TestSnapshotMerge._mkfile(path, "part-b.parquet", 40, 50)
        M.append_snapshot(path, ["part-b.parquet"])  # v3: real appends
        self._drain(spark, path, out, ckpt)
        got = spark.read.parquet(out)
        # the compaction's rewrites were NOT replayed; only the append came
        assert got.count() == 50
        assert got.select("k").distinct().count() == 50

    def test_merge_version_fails_fast_unless_ignore_changes(
        self, spark, tmp_path
    ):
        from pandas_to_postgres_spark.sources import manifest as M
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        spark.dataSource.register(SnapshotDataSource)
        path = str(tmp_path / "t2")
        out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")
        os.makedirs(path)
        TestSnapshotMerge._mkfile(path, "part-a.parquet", 0, 40)
        M.publish_snapshot(path, ["k"])
        self._drain(spark, path, out, ckpt)
        updates = spark.createDataFrame([(5, "NEW")], "k long, v string")
        M.merge_snapshot(spark, path, updates, ["k"])  # v2 removes part-a
        with pytest.raises(Exception, match="ignoreChanges"):
            self._drain(spark, path, out, ckpt)
        # opting in accepts the re-emitted rewritten file
        self._drain(spark, path, out, ckpt, ignore_changes=True)
        got = spark.read.parquet(out)
        assert got.count() == 80  # 40 original + 40 rewritten re-emitted
        assert got.filter("k = 5 and v = 'NEW'").count() == 1


class TestSnapshotWriteWriteConflict:
    """Iceberg/Delta's write-write rule: two rewrites of the SAME file
    abort the loser (publishing would duplicate the winner's survivors
    and resurrect stale rows); rewrites of DIFFERENT files compose via
    the claim-retry."""

    def _table(self, tmp_path):
        from pandas_to_postgres_spark.sources import manifest as M

        path = str(tmp_path / "wwtbl")
        os.makedirs(path)
        TestSnapshotMerge._mkfile(path, "part-a.parquet", 0, 100)
        TestSnapshotMerge._mkfile(path, "part-b.parquet", 100, 200)
        M.publish_snapshot(
            path, ["k"], files=["part-a.parquet", "part-b.parquet"]
        )
        return path

    def test_same_file_conflict_aborts_cleanly(
        self, spark, tmp_path, monkeypatch
    ):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        real = M._claim_version
        state = {"injected": False}

        def racy(p, version, man):
            if not state["injected"]:
                state["injected"] = True
                # the OTHER merge rewrites part-a first and wins
                other = spark.createDataFrame(
                    [(10, "OTHER")], "k long, v string"
                )
                M.merge_snapshot(spark, p, other, ["k"])
            return real(p, version, man)

        monkeypatch.setattr(M, "_claim_version", racy)
        ours = spark.createDataFrame([(20, "OURS")], "k long, v string")
        with pytest.raises(M.SnapshotConflictError, match="rewrote"):
            M.merge_snapshot(spark, path, ours, ["k"])
        # the winner's merge is intact; our aborted rewrite left no rows
        # and no referenced files; the staged part-m files were unlinked
        got = M.read_snapshot(spark, path)
        assert got.count() == 200
        assert got.filter("k = 10").first().v == "OTHER"
        assert got.filter("k = 20").first().v == "old20"
        live = {e["path"] for e in M.load_snapshot(path)["files"]}
        on_disk = {
            f for f in os.listdir(path)
            if f.startswith("part-m") and f.endswith(".parquet")
        }
        assert on_disk <= live  # no orphaned loser rewrites
        # the RE-RUN against the new head succeeds and keeps both writes
        M.merge_snapshot(spark, path, ours, ["k"])
        got = M.read_snapshot(spark, path)
        assert got.filter("k = 10").first().v == "OTHER"
        assert got.filter("k = 20").first().v == "OURS"

    def test_disjoint_files_compose_via_retry(
        self, spark, tmp_path, monkeypatch
    ):
        from pandas_to_postgres_spark.sources import manifest as M

        path = self._table(tmp_path)
        real = M._claim_version
        state = {"injected": False}

        def racy(p, version, man):
            if not state["injected"]:
                state["injected"] = True
                # the other merge touches part-b only; ours touches part-a
                other = spark.createDataFrame(
                    [(150, "OTHER")], "k long, v string"
                )
                M.merge_snapshot(spark, p, other, ["k"])
            return real(p, version, man)

        monkeypatch.setattr(M, "_claim_version", racy)
        ours = spark.createDataFrame([(20, "OURS")], "k long, v string")
        M.merge_snapshot(spark, path, ours, ["k"])  # retries, then lands
        got = M.read_snapshot(spark, path)
        assert got.count() == 200
        assert got.filter("k = 150").first().v == "OTHER"
        assert got.filter("k = 20").first().v == "OURS"
        assert got.select("k").distinct().count() == 200  # no duplicates


class TestJoinMvIncremental:
    """Delta-rule JOIN-view maintenance over two snapshot bronzes:
    refreshes apply only version diffs, stamp applied versions in the
    silver manifest, no-op when nothing changed, and always land exactly
    on the full-join aggregate."""

    def _full(self, spark, o_path, c_path):
        from pandas_to_postgres_spark.sources.manifest import read_snapshot

        o = read_snapshot(spark, o_path)
        c = read_snapshot(spark, c_path)
        import pyspark.sql.functions as F

        return {
            r["segment"]: (r["n"], r["cents"])
            for r in o.join(c, "k")
            .groupBy("segment")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.floor(F.col("amount") * 100 + F.lit(0.5)).cast("long"))
                .cast("long").alias("cents"),
            )
            .collect()
        }

    def test_two_epoch_refresh_matches_full_join_and_stamps(
        self, spark, tmp_path
    ):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sources.manifest import (
            load_snapshot,
            publish_snapshot,
            read_snapshot,
        )
        from pandas_to_postgres_spark.streaming.mv import refresh_join_mv

        o_path, c_path, s_path = (
            str(tmp_path / d) for d in ("o", "c", "s")
        )
        o = spark.range(200).selectExpr(
            "id % 40 AS k", "CAST(id AS DOUBLE) / 3 AS amount"
        )
        c = spark.range(40).selectExpr(
            "id AS k", "concat('seg', CAST(id % 5 AS STRING)) AS segment"
        )
        c.filter("k % 2 = 0").coalesce(1).write.parquet(c_path)
        publish_snapshot(c_path, ["k"])
        o.filter("k < 20").coalesce(1).write.parquet(o_path)
        publish_snapshot(o_path, ["k"])
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        head1 = load_snapshot(s_path)
        assert head1["applied_versions"] == {"left": 1, "right": 1}

        o.filter("k >= 20").coalesce(1).write.mode("append").parquet(o_path)
        publish_snapshot(o_path, ["k"])
        c.filter("k % 2 = 1").coalesce(1).write.mode("append").parquet(c_path)
        publish_snapshot(c_path, ["k"])
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        head2 = load_snapshot(s_path)
        assert head2["applied_versions"] == {"left": 2, "right": 2}

        got = {
            r["segment"]: (r["n"], r["cents"])
            for r in read_snapshot(spark, s_path).collect()
        }
        assert got == self._full(spark, o_path, c_path)

        # no new bronze versions -> no-op (no silver version published)
        head3 = refresh_join_mv(
            spark, s_path, o_path, c_path, "k", "segment", "amount"
        )
        assert head3["version"] == head2["version"]

    def test_right_only_growth_uses_left_prev(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            publish_snapshot,
            read_snapshot,
        )
        from pandas_to_postgres_spark.streaming.mv import refresh_join_mv

        o_path, c_path, s_path = (
            str(tmp_path / d) for d in ("o", "c", "s")
        )
        o = spark.range(100).selectExpr(
            "id % 10 AS k", "CAST(id AS DOUBLE) AS amount"
        )
        c = spark.range(10).selectExpr(
            "id AS k", "concat('s', CAST(id % 3 AS STRING)) AS segment"
        )
        o.coalesce(1).write.parquet(o_path)
        publish_snapshot(o_path, ["k"])
        c.filter("k < 5").coalesce(1).write.parquet(c_path)
        publish_snapshot(c_path, ["k"])
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        # only the RIGHT side grows: the delta term is L_prev x dR
        c.filter("k >= 5").coalesce(1).write.mode("append").parquet(c_path)
        publish_snapshot(c_path, ["k"])
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        got = {
            r["segment"]: (r["n"], r["cents"])
            for r in read_snapshot(spark, s_path).collect()
        }
        assert got == self._full(spark, o_path, c_path)

    def test_compaction_between_refreshes_does_not_double_count(
        self, spark, tmp_path
    ):
        """A compact_snapshot (data_change: false) on a bronze between
        refreshes rewrites already-applied rows into NEW files — an
        endpoint file diff would re-count the whole table into the MV;
        the per-version walk must skip it (ADVICE r7, medium)."""
        from pandas_to_postgres_spark.sources import manifest as M
        from pandas_to_postgres_spark.sources.manifest import (
            publish_snapshot,
            read_snapshot,
        )
        from pandas_to_postgres_spark.streaming.mv import refresh_join_mv

        o_path, c_path, s_path = (
            str(tmp_path / d) for d in ("o", "c", "s")
        )
        o = spark.range(120).selectExpr(
            "id % 12 AS k", "CAST(id AS DOUBLE) AS amount"
        )
        c = spark.range(12).selectExpr(
            "id AS k", "concat('s', CAST(id % 3 AS STRING)) AS segment"
        )
        c.coalesce(1).write.parquet(c_path)
        publish_snapshot(c_path, ["k"])
        # two small files so compaction has something to merge
        o.filter("k < 6").coalesce(1).write.parquet(o_path)
        publish_snapshot(o_path, ["k"])
        o.filter("k >= 6").coalesce(1).write.mode("append").parquet(o_path)
        new = sorted(
            f for f in __import__("os").listdir(o_path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in {
                e["path"] for e in M.load_snapshot(o_path, 1)["files"]
            }
        )
        M.append_snapshot(o_path, new)
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        before = self._full(spark, o_path, c_path)

        M.compact_snapshot(spark, o_path, target_bytes=10**9)
        # refresh after the compaction: nothing new, MUST not re-count
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        got = {
            r["segment"]: (r["n"], r["cents"])
            for r in read_snapshot(spark, s_path).collect()
        }
        assert got == before

        # and new rows after the compaction apply exactly once
        extra = spark.range(120, 144).selectExpr(
            "id % 12 AS k", "CAST(id AS DOUBLE) AS amount"
        )
        extra.coalesce(1).write.mode("append").parquet(o_path)
        newer = sorted(
            f for f in __import__("os").listdir(o_path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and not any(
                f in {e["path"] for e in M.load_snapshot(o_path, v)["files"]}
                for v in M.snapshot_versions(o_path)
            )
        )
        M.append_snapshot(o_path, newer)
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        got2 = {
            r["segment"]: (r["n"], r["cents"])
            for r in read_snapshot(spark, s_path).collect()
        }
        assert got2 == self._full(spark, o_path, c_path)

    def test_right_only_first_refresh_with_empty_left(self, spark, tmp_path):
        """First refresh where ONLY the right bronze has rows used to
        raise IndexError on deltas[0]; it must no-op gracefully and the
        eventual left arrival must produce the exact full join
        (ADVICE r7, low)."""
        from pandas_to_postgres_spark.sources.manifest import (
            publish_snapshot,
            read_snapshot,
        )
        from pandas_to_postgres_spark.streaming.mv import refresh_join_mv

        o_path, c_path, s_path = (
            str(tmp_path / d) for d in ("o", "c", "s")
        )
        c = spark.range(8).selectExpr(
            "id AS k", "concat('s', CAST(id % 2 AS STRING)) AS segment"
        )
        c.coalesce(1).write.parquet(c_path)
        publish_snapshot(c_path, ["k"])
        # right published, left table does not even exist yet
        out = refresh_join_mv(
            spark, s_path, o_path, c_path, "k", "segment", "amount"
        )
        assert out.get("noop") or out.get("applied_versions")

        o = spark.range(80).selectExpr(
            "id % 8 AS k", "CAST(id AS DOUBLE) AS amount"
        )
        o.coalesce(1).write.parquet(o_path)
        publish_snapshot(o_path, ["k"])
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        got = {
            r["segment"]: (r["n"], r["cents"])
            for r in read_snapshot(spark, s_path).collect()
        }
        assert got == self._full(spark, o_path, c_path)

    def test_left_only_growth_with_unpublished_right(self, spark, tmp_path):
        """Left rows with NO right table at all: refresh must not crash
        reading an unpublished right head, and the pairs must appear
        exactly once when the right table finally publishes."""
        from pandas_to_postgres_spark.sources.manifest import (
            publish_snapshot,
            read_snapshot,
        )
        from pandas_to_postgres_spark.streaming.mv import refresh_join_mv

        o_path, c_path, s_path = (
            str(tmp_path / d) for d in ("o", "c", "s")
        )
        o = spark.range(40).selectExpr(
            "id % 4 AS k", "CAST(id AS DOUBLE) AS amount"
        )
        o.coalesce(1).write.parquet(o_path)
        publish_snapshot(o_path, ["k"])
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")

        c = spark.range(4).selectExpr(
            "id AS k", "concat('s', CAST(id AS STRING)) AS segment"
        )
        c.coalesce(1).write.parquet(c_path)
        publish_snapshot(c_path, ["k"])
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        got = {
            r["segment"]: (r["n"], r["cents"])
            for r in read_snapshot(spark, s_path).collect()
        }
        assert got == self._full(spark, o_path, c_path)

    def test_dv_delete_on_bronze_fails_loudly(self, spark, tmp_path):
        """A DV DELETE between refreshes breaks the append-only delta
        rule — the refresh must raise, not silently corrupt the MV."""
        import pytest as _pytest

        from pandas_to_postgres_spark.sources.manifest import (
            delete_snapshot_rows_dv,
            publish_snapshot,
        )
        from pandas_to_postgres_spark.streaming.mv import refresh_join_mv
        from pyspark.sql import Row

        o_path, c_path, s_path = (
            str(tmp_path / d) for d in ("o", "c", "s")
        )
        o = spark.range(40).selectExpr(
            "id % 4 AS k", "CAST(id AS DOUBLE) AS amount"
        )
        c = spark.range(4).selectExpr(
            "id AS k", "concat('s', CAST(id AS STRING)) AS segment"
        )
        o.coalesce(1).write.parquet(o_path)
        publish_snapshot(o_path, ["k"])
        c.coalesce(1).write.parquet(c_path)
        publish_snapshot(c_path, ["k"])
        refresh_join_mv(spark, s_path, o_path, c_path, "k", "segment", "amount")
        delete_snapshot_rows_dv(
            spark, o_path, spark.createDataFrame([Row(k=1)]), ["k"]
        )
        with _pytest.raises(ValueError, match="deletion-vector"):
            refresh_join_mv(
                spark, s_path, o_path, c_path, "k", "segment", "amount"
            )
