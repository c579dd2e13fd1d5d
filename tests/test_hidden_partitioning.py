"""Hidden partitioning (Iceberg partition transforms) on the snapshot
table: predicates on RAW columns prune files through the spec's
transforms — users never name a layout column, and pruning is always a
superset of the exact answer."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pandas_to_postgres_spark.sources import manifest as M
from pandas_to_postgres_spark.sources.partition_spec import (
    _py_transform,
    plan_hidden_scan,
    read_snapshot_hidden,
    spec_field,
    write_partitioned_snapshot,
)


@pytest.fixture
def events(spark):
    rows = [
        Row(
            eid=i,
            uid=i % 37,
            day_str=f"2024-01-{(i % 9) + 1:02d}",
            amount=float(i) * 0.25,
            code=f"AB{i % 5}{i}",
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows)
    return df.withColumn(
        "ts", F.to_timestamp(F.concat("day_str", F.lit(" 12:00:00")))
    ).drop("day_str")


class TestTransformParity:
    """The Spark writer expression and the Python planner replay must
    agree on every transform — parity is what makes pruning exact."""

    @pytest.mark.parametrize(
        "field,col,values",
        [
            (spec_field("bucket", "uid", 8), "uid", [0, 1, 7, 36, 123456]),
            (spec_field("truncate", "eid", 100), "eid", [0, 99, 100, 499]),
            (spec_field("truncate", "code", 3), "code", ["AB1", "AB23", "x"]),
            (spec_field("identity", "uid"), "uid", [0, 36]),
        ],
    )
    def test_spark_matches_python(self, spark, field, col, values):
        from pandas_to_postgres_spark.sources.partition_spec import (
            _spark_transform,
        )

        df = spark.createDataFrame([Row(**{col: v}) for v in values])
        dtype = dict(df.dtypes)[col]
        got = [
            r["t"]
            for r in df.select(
                _spark_transform(field, dtype).alias("t")
            ).collect()
        ]
        want = [_py_transform(field, v) for v in values]
        assert got == want

    def test_day_transform_parity(self, spark):
        from pandas_to_postgres_spark.sources.partition_spec import (
            _spark_transform,
        )

        import datetime

        vals = [datetime.datetime(2024, 1, 3, 23, 59), datetime.datetime(2023, 12, 31)]
        df = spark.createDataFrame([Row(ts=v) for v in vals])
        field = spec_field("day", "ts")
        got = [
            r["t"]
            for r in df.select(
                _spark_transform(field, "timestamp").alias("t")
            ).collect()
        ]
        assert got == [_py_transform(field, v) for v in vals]
        assert got == ["2024-01-03", "2023-12-31"]

    def test_truncate_negative_ints_floor(self, spark):
        from pandas_to_postgres_spark.sources.partition_spec import (
            _spark_transform,
        )

        field = spec_field("truncate", "k", 10)
        df = spark.createDataFrame([Row(k=-1), Row(k=-10), Row(k=-11)])
        got = [
            r["t"]
            for r in df.select(_spark_transform(field, "bigint").alias("t"))
            .collect()
        ]
        assert got == ["-10", "-10", "-20"]
        assert [_py_transform(field, v) for v in (-1, -10, -11)] == got


class TestHiddenPartitionedTable:
    def _table(self, spark, events, tmp_path):
        p = str(tmp_path / "hidden")
        spec = [spec_field("day", "ts"), spec_field("bucket", "uid", 4)]
        write_partitioned_snapshot(spark, events, p, spec, stat_cols=["eid"])
        return p

    def test_every_file_holds_one_partition_tuple(self, spark, events, tmp_path):
        p = self._table(spark, events, tmp_path)
        snap = M.load_snapshot(p)
        assert snap["partition_spec"][0]["transform"] == "day"
        for e in snap["files"]:
            df = spark.read.parquet(os.path.join(p, e["path"]))
            days = [
                r[0]
                for r in df.select(
                    F.date_format("ts", "yyyy-MM-dd")
                ).distinct().collect()
            ]
            assert days == [e["partition"][snap["partition_spec"][0]["name"]]]

    def test_day_range_prunes_and_matches_full_filter(
        self, spark, events, tmp_path
    ):
        import datetime

        p = self._table(spark, events, tmp_path)
        lo = datetime.datetime(2024, 1, 2)
        hi = datetime.datetime(2024, 1, 3, 23, 59, 59)
        plan = plan_hidden_scan(p, {"ts": ("between", lo, hi)})
        assert 0 < len(plan["keep"]) < plan["total_files"]
        kept_days = {
            e["partition"]["__p_day_ts"] for e in plan["keep"]
        }
        assert kept_days == {"2024-01-02", "2024-01-03"}
        got = (
            read_snapshot_hidden(spark, p, {"ts": ("between", lo, hi)})
            .orderBy("eid")
            .collect()
        )
        want = (
            events.filter(F.col("ts").between(lo, hi)).orderBy("eid").collect()
        )
        assert [r["eid"] for r in got] == [r["eid"] for r in want]

    def test_bucket_equality_prunes_to_one_bucket(self, spark, events, tmp_path):
        p = self._table(spark, events, tmp_path)
        plan = plan_hidden_scan(p, {"uid": ("=", 7)})
        buckets = {e["partition"]["__p_bucket_uid_4"] for e in plan["keep"]}
        assert buckets == {_py_transform(spec_field("bucket", "uid", 4), 7)}
        got = read_snapshot_hidden(spark, p, {"uid": ("=", 7)})
        want = events.filter(F.col("uid") == 7)
        assert got.count() == want.count() > 0
        assert got.agg(F.sum("eid")).first()[0] == want.agg(F.sum("eid")).first()[0]

    def test_bucket_range_cannot_prune(self, spark, events, tmp_path):
        p = self._table(spark, events, tmp_path)
        plan = plan_hidden_scan(p, {"uid": ("between", 3, 5)})
        assert len(plan["keep"]) == plan["total_files"]

    def test_combined_predicates_intersect_pruning(self, spark, events, tmp_path):
        import datetime

        p = self._table(spark, events, tmp_path)
        lo = datetime.datetime(2024, 1, 5)
        hi = datetime.datetime(2024, 1, 5, 23, 59)
        preds = {"ts": ("between", lo, hi), "uid": ("=", 12)}
        plan = plan_hidden_scan(p, preds)
        day_only = plan_hidden_scan(p, {"ts": ("between", lo, hi)})
        assert len(plan["keep"]) < len(day_only["keep"])
        got = read_snapshot_hidden(spark, p, preds)
        want = events.filter(
            F.col("ts").between(lo, hi) & (F.col("uid") == 12)
        )
        assert sorted(r["eid"] for r in got.collect()) == sorted(
            r["eid"] for r in want.collect()
        )

    def test_all_pruned_returns_typed_empty(self, spark, events, tmp_path):
        import datetime

        p = self._table(spark, events, tmp_path)
        lo = datetime.datetime(2030, 1, 1)
        hi = datetime.datetime(2030, 1, 2)
        out = read_snapshot_hidden(spark, p, {"ts": ("between", lo, hi)})
        assert out.count() == 0
        assert set(events.columns) <= set(out.columns)

    def test_datasource_pushfilters_prunes_partitions(
        self, spark, events, tmp_path
    ):
        """format('snapshot') + pushFilters: a raw user_id equality maps
        through the md5 bucket transform at PLANNING time — partitions()
        schedules only the matching bucket's files — and the standard
        read returns exactly the filtered rows."""
        from pyspark.sql.datasource import EqualTo

        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
            SnapshotReader,
        )

        p = self._table(spark, events, tmp_path)
        total = len(M.load_snapshot(p)["files"])

        r = SnapshotReader({"path": p}, ["eid", "uid", "ts", "amount", "code"])
        list(r.pushFilters([EqualTo(("uid",), 7)]))
        parts = r.partitions()
        assert 0 < len(parts) < total
        want_bucket = _py_transform(spec_field("bucket", "uid", 4), 7)
        snap = M.load_snapshot(p)
        kept_names = {os.path.basename(pt.value[0]) for pt in parts}
        for e in snap["files"]:
            if e["path"] in kept_names:
                assert e["partition"]["__p_bucket_uid_4"] == want_bucket

        # e2e value check through the standard reader API
        spark.dataSource.register(SnapshotDataSource)
        got = (
            spark.read.format("snapshot").option("path", p).load()
            .filter(F.col("uid") == 7)
            .agg(F.count(F.lit(1)), F.sum("eid"))
            .first()
        )
        want = events.filter(F.col("uid") == 7).agg(
            F.count(F.lit(1)), F.sum("eid")
        ).first()
        assert tuple(got) == tuple(want)

    def test_datasource_pushfilters_day_range_prunes(
        self, spark, events, tmp_path
    ):
        import datetime

        from pyspark.sql.datasource import (
            GreaterThanOrEqual,
            LessThanOrEqual,
        )

        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotReader,
        )

        p = self._table(spark, events, tmp_path)
        total = len(M.load_snapshot(p)["files"])
        r = SnapshotReader({"path": p}, ["eid", "uid", "ts", "amount", "code"])
        lo = datetime.datetime(2024, 1, 2)
        hi = datetime.datetime(2024, 1, 3, 23, 59, 59)
        list(r.pushFilters([GreaterThanOrEqual(("ts",), lo),
                            LessThanOrEqual(("ts",), hi)]))
        parts = r.partitions()
        assert 0 < len(parts) < total
        snap = M.load_snapshot(p)
        kept_names = {os.path.basename(pt.value[0]) for pt in parts}
        days = {
            e["partition"]["__p_day_ts"]
            for e in snap["files"]
            if e["path"] in kept_names
        }
        assert days == {"2024-01-02", "2024-01-03"}

    def test_time_travel_composes(self, spark, events, tmp_path):
        """A second partitioned write is a logical overwrite: v1 keeps
        serving the old rows, the head serves the new."""
        p = self._table(spark, events, tmp_path)
        spec = [spec_field("day", "ts"), spec_field("bucket", "uid", 4)]
        write_partitioned_snapshot(
            spark, events.limit(50), p, spec, stat_cols=["eid"]
        )
        assert M.read_snapshot(spark, p, version=1).count() == 500
        assert M.read_snapshot(spark, p, version=2).count() == 50
        plan_v1 = plan_hidden_scan(p, {"uid": ("=", 7)}, version=1)
        assert len(plan_v1["keep"]) > 0


class TestPartitionedStreamingIngest:
    """Exactly-once streaming ingest into a hidden-partitioned snapshot:
    each epoch clusters by the spec's transforms, tuples land in
    manifest entries, the spec publishes once and inherits thereafter —
    raw-column pruning works over every epoch while the stream runs."""

    def _drain(self, spark, src, table, ckpt, spec):
        from pandas_to_postgres_spark.streaming.sink import (
            partitioned_snapshot_table_writer,
            stream_to_batch_sink,
        )

        stream = spark.readStream.schema("uid long, amount double").parquet(src)
        q = stream_to_batch_sink(
            stream,
            partitioned_snapshot_table_writer(table, spec, ["uid"]),
            checkpoint_dir=ckpt,
        )
        q.awaitTermination()

    def test_epochs_partition_and_prune_across_versions(self, spark, tmp_path):
        src = str(tmp_path / "src")
        table = str(tmp_path / "ptbl")
        ckpt = str(tmp_path / "ckpt")
        spec = [spec_field("bucket", "uid", 4)]
        spark.range(100).selectExpr(
            "id AS uid", "CAST(id AS DOUBLE) / 2 AS amount"
        ).write.mode("overwrite").parquet(src)
        self._drain(spark, src, table, ckpt, spec)
        spark.range(100, 160).selectExpr(
            "id AS uid", "CAST(id AS DOUBLE) / 2 AS amount"
        ).write.mode("append").parquet(src)
        self._drain(spark, src, table, ckpt, spec)

        snap = M.load_snapshot(table)
        assert snap["version"] == 2
        assert snap["partition_spec"][0]["transform"] == "bucket"
        pname = snap["partition_spec"][0]["name"]
        assert all(e.get("partition", {}).get(pname) is not None
                   for e in snap["files"])

        # hidden pruning over BOTH epochs' files
        plan = plan_hidden_scan(table, {"uid": ("=", 7)})
        want_bucket = _py_transform(spec_field("bucket", "uid", 4), 7)
        assert 0 < len(plan["keep"]) < plan["total_files"]
        assert all(e["partition"][pname] == want_bucket for e in plan["keep"])
        got = read_snapshot_hidden(spark, table, {"uid": ("=", 7)})
        assert [r["uid"] for r in got.collect()] == [7]
        assert M.read_snapshot(spark, table).count() == 160
        # v1 time-travels and still prunes
        assert M.read_snapshot(spark, table, version=1).count() == 100
        assert len(plan_hidden_scan(table, {"uid": ("=", 7)}, version=1)["keep"]) > 0

    def test_compaction_inherits_spec_and_stays_superset(self, spark, tmp_path):
        """A rewrite (compaction) drops per-file tuples but INHERITS the
        spec — pruning conservatively keeps rewritten files (no tuple =
        may match), so results stay exact."""
        src = str(tmp_path / "src")
        table = str(tmp_path / "ctbl")
        ckpt = str(tmp_path / "ckpt")
        spec = [spec_field("bucket", "uid", 4)]
        spark.range(100).selectExpr(
            "id AS uid", "CAST(id AS DOUBLE) / 2 AS amount"
        ).write.mode("overwrite").parquet(src)
        self._drain(spark, src, table, ckpt, spec)
        M.compact_snapshot(spark, table, target_bytes=10**9)
        head = M.load_snapshot(table)
        assert head.get("partition_spec"), "rewrites must inherit the spec"
        got = read_snapshot_hidden(spark, table, {"uid": ("=", 7)})
        assert [r["uid"] for r in got.collect()] == [7]


class TestSpecEvolution:
    """Iceberg spec-id-per-file partition evolution: a table can
    re-partition mid-life with NO rewrite — old files keep pruning by
    the spec they were written under, new files by the new default."""

    def _evolved_table(self, spark, tmp_path):
        p = str(tmp_path / "evolve")
        old = spark.createDataFrame(
            [Row(eid=i, uid=i % 16, amount=float(i)) for i in range(200)]
        )
        write_partitioned_snapshot(
            spark, old, p, [spec_field("bucket", "uid", 4)],
            stat_cols=["eid"],
        )
        new = spark.createDataFrame(
            [
                Row(eid=i, uid=i % 16, amount=float(i))
                for i in range(200, 400)
            ]
        )
        # EVOLVE: same source column, finer bucketing — a same-named
        # field whose transform changed is the dangerous case
        from pandas_to_postgres_spark.sources.partition_spec import (
            append_partitioned_snapshot,
        )

        append_partitioned_snapshot(
            spark, new, p, [spec_field("bucket", "uid", 8)],
            stat_cols=["eid"],
        )
        return p

    def test_evolution_rewrites_nothing_and_registers_specs(
        self, spark, tmp_path
    ):
        p = self._evolved_table(spark, tmp_path)
        v1 = {e["path"] for e in M.load_snapshot(p, 1)["files"]}
        head = M.load_snapshot(p)
        assert v1 <= {e["path"] for e in head["files"]}, "no rewrite"
        assert set(head["partition_specs"]) == {"0", "1"}
        assert head["default_spec_id"] == "1"
        sids = {e["path"]: e.get("spec_id") for e in head["files"]}
        assert {sids[f] for f in v1} == {"0"}
        assert {s for f, s in sids.items() if f not in v1} == {"1"}

    def test_each_vintage_prunes_by_its_own_spec(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.partition_spec import (
            plan_hidden_scan,
            read_snapshot_hidden,
        )

        p = self._evolved_table(spark, tmp_path)
        head = M.load_snapshot(p)
        n_old = sum(1 for e in head["files"] if e.get("spec_id") == "0")
        n_new = sum(1 for e in head["files"] if e.get("spec_id") == "1")
        plan = plan_hidden_scan(p, {"uid": ("=", 7)})
        kept_old = [e for e in plan["keep"] if e.get("spec_id") == "0"]
        kept_new = [e for e in plan["keep"] if e.get("spec_id") == "1"]
        # bucket(4) keeps ~1/4 of old files, bucket(8) ~1/8 of new ones
        assert len(kept_old) < n_old and len(kept_new) < n_new
        got = sorted(
            r["eid"] for r in read_snapshot_hidden(
                spark, p, {"uid": ("=", 7)}
            ).collect()
        )
        assert got == [i for i in range(400) if i % 16 == 7]

    def test_wrong_spec_would_misprune(self, spark, tmp_path):
        """The failure the per-entry resolution prevents: evaluating an
        OLD entry against the NEW spec's bucket(8) hash drops files that
        actually contain the key."""
        from pandas_to_postgres_spark.sources.partition_spec import (
            _entry_may_match,
        )

        p = self._evolved_table(spark, tmp_path)
        head = M.load_snapshot(p)
        new_spec = head["partition_specs"]["1"]
        old_entries = [
            e for e in head["files"] if e.get("spec_id") == "0"
        ]
        # at least one uid in 0..15 must demonstrate the divergence
        diverges = False
        for uid in range(16):
            kept_wrong = [
                e for e in old_entries
                if _entry_may_match(e, new_spec, {"uid": ("=", uid)})
            ]
            old_spec = head["partition_specs"]["0"]
            kept_right = [
                e for e in old_entries
                if _entry_may_match(e, old_spec, {"uid": ("=", uid)})
            ]
            if {e["path"] for e in kept_wrong} != {
                e["path"] for e in kept_right
            }:
                diverges = True
                break
        assert diverges, "fixture too benign: bump sizes"

    def test_datasource_prunes_across_specs(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        p = self._evolved_table(spark, tmp_path)
        spark.dataSource.register(SnapshotDataSource)
        df = (
            spark.read.format("snapshot")
            .option("path", p)
            .load()
            .filter(F.col("uid") == 3)
        )
        got = sorted(r["eid"] for r in df.collect())
        assert got == [i for i in range(400) if i % 16 == 3]


class TestShardPartitionSummaries:
    """Two-level hidden-partition pruning: shard references carry
    distinct-transformed-value summaries, so an equality predicate
    skips WHOLE shards without opening them — metadata I/O stays
    O(matching shards) at 10^6 files (Iceberg manifest-list skip)."""

    @pytest.fixture
    def sharded_table(self, spark, tmp_path, monkeypatch):
        monkeypatch.setattr(M, "INLINE_MAX", 4)
        monkeypatch.setattr(M, "SHARD_TARGET", 4)
        p = str(tmp_path / "shard_hp")
        # 16 day-partitions -> 16 files (the writer clusters one file
        # per tuple here) -> 4 shards of 4 consecutive days each (the
        # flatten walks days in sorted order)
        df = spark.createDataFrame(
            [
                Row(
                    eid=i,
                    day_str=f"2024-02-{(i % 16) + 1:02d} 01:00:00",
                    amount=float(i),
                )
                for i in range(160)
            ]
        ).withColumn("ts", F.to_timestamp("day_str")).drop("day_str")
        write_partitioned_snapshot(
            spark, df, p, [spec_field("day", "ts")], stat_cols=["eid"],
        )
        return p

    def test_summaries_written_and_shards_skipped(
        self, spark, sharded_table
    ):
        from pandas_to_postgres_spark.sources.partition_spec import (
            plan_hidden_scan,
        )

        raw = M.load_snapshot(sharded_table, materialize=False)
        assert "shards" in raw, "fixture must produce a sharded manifest"
        assert all("partitions" in r for r in raw["shards"])
        import datetime

        lo = datetime.datetime(2024, 2, 2, 0, 0, 0)
        hi = datetime.datetime(2024, 2, 2, 23, 59, 59)
        plan = plan_hidden_scan(sharded_table, {"ts": ("between", lo, hi)})
        assert plan["shards_total"] > 0
        assert plan["shards_read"] < plan["shards_total"], (
            f"no shard skipped: {plan['shards_read']}/{plan['shards_total']}"
        )
        # superset guarantee: kept entries cover the day exactly
        assert plan["keep"], "pruned everything that matches"

    def test_read_stays_exact_across_shard_skip(self, spark, sharded_table):
        from pandas_to_postgres_spark.sources.partition_spec import (
            read_snapshot_hidden,
        )
        import datetime

        lo = datetime.datetime(2024, 2, 3, 0, 0, 0)
        hi = datetime.datetime(2024, 2, 3, 23, 59, 59)
        got = sorted(
            r["eid"]
            for r in read_snapshot_hidden(
                spark, sharded_table, {"ts": ("between", lo, hi)}
            ).collect()
        )
        assert got == [i for i in range(160) if i % 16 == 2]

    def test_mixed_spec_shard_has_no_summary(self, spark, tmp_path):
        entries = [
            {"path": "a.parquet", "partition": {"d": "x"}, "spec_id": "0"},
            {"path": "b.parquet", "partition": {"d": "y"}, "spec_id": "1"},
        ]
        assert M._shard_partition_summary(entries) is None
        one = [
            {"path": "a.parquet", "partition": {"d": "x"}},
            {"path": "b.parquet", "partition": {"d": "y"}},
        ]
        sid, psum = M._shard_partition_summary(one)
        assert sid == "0" and psum == {"d": ["x", "y"]}


class TestStreamingSinkSpecEvolution:
    def test_epoch_writer_stamps_spec_id_after_evolution(
        self, spark, tmp_path
    ):
        """A stream writing under an EVOLVED spec must stamp its
        entries' spec_id — unstamped entries resolve to the table's
        FIRST spec and would prune by the wrong hash."""
        from pandas_to_postgres_spark.sources.partition_spec import (
            append_partitioned_snapshot,
            plan_hidden_scan,
            read_snapshot_hidden,
        )
        from pandas_to_postgres_spark.streaming.sink import (
            partitioned_snapshot_table_writer,
        )

        table = str(tmp_path / "evo_stream")
        spec_a = [spec_field("bucket", "uid", 4)]
        spec_b = [spec_field("bucket", "uid", 8)]

        # epoch 0 under spec A via the streaming epoch writer
        w_a = partitioned_snapshot_table_writer(table, spec_a, ["uid"])
        w_a(
            spark.range(100).selectExpr(
                "id AS uid", "CAST(id AS DOUBLE) AS amount"
            ),
            0,
        )
        # batch append EVOLVES the table to spec B
        append_partitioned_snapshot(
            spark,
            spark.range(100, 160).selectExpr(
                "id AS uid", "CAST(id AS DOUBLE) AS amount"
            ),
            table,
            spec_b,
            stat_cols=["uid"],
        )
        # epoch 1 keeps streaming — still under spec B
        w_b = partitioned_snapshot_table_writer(table, spec_b, ["uid"])
        w_b(
            spark.range(160, 200).selectExpr(
                "id AS uid", "CAST(id AS DOUBLE) AS amount"
            ),
            1,
        )
        head = M.load_snapshot(table)
        assert set(head["partition_specs"]) == {"0", "1"}
        sids = {str(e.get("spec_id", "0")) for e in head["files"]}
        assert sids == {"0", "1"}
        # epoch-1 files must carry spec B's id explicitly
        e1 = [e for e in head["files"] if e["path"].startswith("part-e1-")]
        assert e1 and all(e.get("spec_id") == "1" for e in e1)
        plan = plan_hidden_scan(table, {"uid": ("=", 170)})
        assert 0 < len(plan["keep"]) < plan["total_files"]
        got = read_snapshot_hidden(spark, table, {"uid": ("=", 170)})
        assert [r["uid"] for r in got.collect()] == [170]
        # and spec-A-era keys still resolve through spec A
        got0 = read_snapshot_hidden(spark, table, {"uid": ("=", 7)})
        assert [r["uid"] for r in got0.collect()] == [7]
