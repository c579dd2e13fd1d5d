"""Per-file Bloom sidecar index: point lookups prune files that min/max
stats cannot (arrival-ordered layouts), stay superset-safe under false
positives, and tolerate appends published after the index was built."""

import os

import pytest
from pyspark.sql import functions as F

from pandas_to_postgres_spark.sources import manifest as M
from pandas_to_postgres_spark.sources.file_bloom import (
    _positions_py,
    build_bloom_index,
    plan_point_lookup,
    read_snapshot_point,
)


@pytest.fixture
def arrival_table(spark, tmp_path):
    """6 epoch-ish files, each spanning the WHOLE key domain — min/max
    envelopes all overlap, so stats pruning keeps everything and only
    the Bloom index can narrow a point probe."""
    p = str(tmp_path / "tbl")
    base = spark.range(6000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) * 0.5 AS v"
    )
    for i in range(6):
        base.filter(F.col("k") % 6 == i).coalesce(1).write.mode(
            "append"
        ).parquet(p)
    M.publish_snapshot(p, ["k"])
    return p


class TestBloomIndex:
    def test_spark_positions_match_python(self, spark):
        """Hash parity: the Spark expression inside build_bloom_index and
        the Python probe must set the same bits."""
        from pyspark.sql import Row

        vals = [0, 17, 999999, -3]
        df = spark.createDataFrame([Row(v=x) for x in vals])
        k = 5
        got = (
            df.select(
                F.col("v"),
                F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
            )
            .select(
                "v",
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("v").cast("string"),
                                    F.lit(":"),
                                    F.col("j"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % (1 << 17)
                ).alias("p"),
            )
            .groupBy("v")
            .agg(F.collect_list("p").alias("ps"))
            .collect()
        )
        by_v = {r["v"]: sorted(r["ps"]) for r in got}
        for x in vals:
            assert by_v[x] == sorted(_positions_py(x))

    def test_point_lookup_prunes_where_stats_cannot(
        self, spark, arrival_table
    ):
        p = arrival_table
        # stats CANNOT prune: every file spans the whole domain
        stats_plan = M.plan_snapshot_scan(p, "k", 1234, 1234)
        assert len(stats_plan["keep"]) == stats_plan["total_files"] == 6

        build_bloom_index(spark, p, "k")
        plan = plan_point_lookup(p, "k", 1234)
        assert plan["indexed_files"] == 6
        # key 1234 lives in exactly one file (k % 6 == 4); Bloom keeps it
        # plus at most rare false positives
        assert 1 <= len(plan["keep"]) <= 2
        got = read_snapshot_point(spark, p, "k", 1234).collect()
        assert [(r["k"], r["v"]) for r in got] == [(1234, 617.0)]

    def test_absent_key_returns_typed_empty(self, spark, arrival_table):
        p = arrival_table
        build_bloom_index(spark, p, "k")
        out = read_snapshot_point(spark, p, "k", 10_000_000)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["k", "v"]

    def test_appended_files_conservatively_kept(self, spark, arrival_table):
        """Files published after the index was built have no bitset —
        they must stay in every probe's file list (correctness over
        pruning)."""
        p = arrival_table
        build_bloom_index(spark, p, "k")
        extra = spark.range(6000, 6100).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) * 0.5 AS v"
        )
        extra.coalesce(1).write.mode("append").parquet(p)
        new = sorted(
            f for f in os.listdir(p)
            if f.endswith(".parquet")
        )
        head = {e["path"] for e in M.load_snapshot(p)["files"]}
        M.append_snapshot(p, [f for f in new if f not in head])

        plan = plan_point_lookup(p, "k", 6050)
        assert plan["indexed_files"] == 6
        kept = {e["path"] for e in plan["keep"]}
        assert any(f not in head for f in kept), "new file must be kept"
        got = read_snapshot_point(spark, p, "k", 6050).collect()
        assert [(r["k"], r["v"]) for r in got] == [(6050, 3025.0)]

    def test_no_index_keeps_everything(self, spark, arrival_table):
        plan = plan_point_lookup(arrival_table, "k", 42)
        assert len(plan["keep"]) == plan["total_files"]
        assert plan["indexed_files"] == 0


class TestBloomShardedBuildAndLifecycle:
    """Round-8: the build leg writes sidecar SHARDS from executors (no
    driver-side bitset collect), the probe streams them shard-by-shard,
    and expiry/vacuum retire sidecars with their versions."""

    def test_build_publishes_sharded_sidecar(self, spark, arrival_table):
        p = arrival_table
        side = build_bloom_index(spark, p, "k", files_per_shard=2)
        assert "files" not in side and side["shards"]
        # every shard exists on disk and the union covers all 6 files
        covered = set()
        for s in side["shards"]:
            assert os.path.exists(os.path.join(p, s))
            import json

            with open(os.path.join(p, s)) as fh:
                covered.update(json.load(fh))
        assert len(covered) == 6
        # probe still prunes to exactly the one true file (+ rare FPs)
        plan = plan_point_lookup(p, "k", 1234)
        assert plan["indexed_files"] == 6
        assert 1 <= len(plan["keep"]) <= 2
        got = read_snapshot_point(spark, p, "k", 1234).collect()
        assert [(r["k"],) for r in got] == [(1234,)]

    def test_inline_legacy_sidecar_still_probes(self, spark, arrival_table):
        """Back-compat: a pre-shard inline sidecar (files map in the top
        JSON) still plans correctly."""
        import base64
        import json

        p = arrival_table
        side = build_bloom_index(spark, p, "k")
        # fold the shards back into the legacy inline form
        blooms = {}
        for s in side["shards"]:
            with open(os.path.join(p, s)) as fh:
                blooms.update(json.load(fh))
            os.remove(os.path.join(p, s))
        legacy = {
            "col": "k", "m": side["m"], "k": side["k"],
            "version": side["version"], "files": blooms,
        }
        with open(os.path.join(p, f"_bloom-v{side['version']}-k.json"), "w") as fh:
            json.dump(legacy, fh)
        plan = plan_point_lookup(p, "k", 777)
        assert plan["indexed_files"] == 6
        got = read_snapshot_point(spark, p, "k", 777).collect()
        assert [(r["k"],) for r in got] == [(777,)]

    def test_expire_retires_bloom_sidecars(self, spark, arrival_table):
        p = arrival_table
        build_bloom_index(spark, p, "k")
        # publish a second version so v1 can expire
        spark.range(6000, 6010).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) * 0.5 AS v"
        ).coalesce(1).write.mode("append").parquet(p)
        published = {e["path"] for e in M.load_snapshot(p, 1)["files"]}
        new = sorted(
            f for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in published
        )
        M.append_snapshot(p, new)
        out = M.expire_snapshots(p, keep_latest=1)
        assert out["deleted_blooms"], "v1 bloom sidecar must retire with v1"
        assert not [
            f for f in os.listdir(p) if f.startswith("_bloom-v1-k.json")
        ]
        # orphaned shards now age-gate through vacuum
        vac = M.vacuum_orphans(p, grace_seconds=0)
        assert not [
            f for f in os.listdir(p)
            if f.startswith("_bloom-v1-") and "-shard-" in f
        ], f"orphan bloom shards must vacuum: {vac}"

    def test_vacuum_keeps_referenced_bloom_shards(self, spark, arrival_table):
        p = arrival_table
        side = build_bloom_index(spark, p, "k")
        M.vacuum_orphans(p, grace_seconds=0)
        for s in side["shards"]:
            assert os.path.exists(os.path.join(p, s)), (
                "live sidecar's shards must survive vacuum"
            )
        plan = plan_point_lookup(p, "k", 42)
        assert plan["indexed_files"] == 6


class TestTokenBloomIndex:
    """Full-text twin of the value index: per-file term blooms prune
    CONTAINS-term scans; exact tokenizer re-check keeps it a superset."""

    @pytest.fixture
    def text_table(self, spark, tmp_path):
        from pyspark.sql import Row

        p = str(tmp_path / "txt")
        rows = [
            Row(doc_id=i, text=f"common words everywhere doc{i} "
                + ("needle haystack" if i % 7 == 0 else "plain filler"))
            for i in range(140)
        ]
        df = spark.createDataFrame(rows)
        for i in range(4):
            df.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
                "append"
            ).parquet(p)
        M.publish_snapshot(p, ["doc_id"])
        return p

    def test_term_lookup_prunes_and_is_exact(self, spark, text_table):
        from pandas_to_postgres_spark.sources.file_bloom import (
            build_token_bloom_index,
            plan_point_lookup,
            read_snapshot_contains,
        )

        p = text_table
        side = build_token_bloom_index(spark, p, "text", files_per_shard=2)
        assert side["col"] == "text__tokens" and side["shards"]
        # a term only some files contain prunes; a ubiquitous one keeps all
        plan = plan_point_lookup(p, "text__tokens", "needle")
        assert plan["indexed_files"] == 4
        got = sorted(
            r["doc_id"]
            for r in read_snapshot_contains(
                spark, p, "text", "needle"
            ).collect()
        )
        assert got == [i for i in range(140) if i % 7 == 0]
        every = plan_point_lookup(p, "text__tokens", "common")
        assert len(every["keep"]) == 4

    def test_absent_term_returns_typed_empty(self, spark, text_table):
        from pandas_to_postgres_spark.sources.file_bloom import (
            build_token_bloom_index,
            read_snapshot_contains,
        )

        p = text_table
        build_token_bloom_index(spark, p, "text")
        got = read_snapshot_contains(spark, p, "text", "zzzzmissing")
        assert got.count() == 0
        assert set(got.columns) == {"doc_id", "text"}

    def test_term_matching_is_word_boundary_not_substring(
        self, spark, text_table
    ):
        from pandas_to_postgres_spark.sources.file_bloom import (
            build_token_bloom_index,
            read_snapshot_contains,
        )

        p = text_table
        build_token_bloom_index(spark, p, "text")
        # "needl" is a substring of "needle" but not a token
        assert read_snapshot_contains(spark, p, "text", "needl").count() == 0
        # matching is case-insensitive through the shared tokenizer
        assert (
            read_snapshot_contains(spark, p, "text", "NEEDLE").count()
            == 20
        )

    def test_honors_deletion_vectors(self, spark, text_table):
        from pyspark.sql import Row

        from pandas_to_postgres_spark.sources.file_bloom import (
            build_token_bloom_index,
            read_snapshot_contains,
        )
        from pandas_to_postgres_spark.sources.manifest import (
            delete_snapshot_rows_dv,
        )

        p = text_table
        build_token_bloom_index(spark, p, "text")
        delete_snapshot_rows_dv(
            spark, p, spark.createDataFrame([Row(doc_id=0), Row(doc_id=7)]),
            ["doc_id"],
        )
        got = sorted(
            r["doc_id"]
            for r in read_snapshot_contains(
                spark, p, "text", "needle"
            ).collect()
        )
        assert got == [i for i in range(140) if i % 7 == 0 and i not in (0, 7)]


class TestIncrementalIndexRefresh:
    """update_bloom_index: O(new files) refresh — prior shards carry
    over by reference, covered files never rebuild, probes see the
    union."""

    def test_refresh_indexes_only_new_files(self, spark, arrival_table):
        import json as _json

        from pandas_to_postgres_spark.sources.file_bloom import (
            build_bloom_index,
            plan_point_lookup,
            read_snapshot_point,
            update_bloom_index,
        )

        p = arrival_table
        side1 = build_bloom_index(spark, p, "k", files_per_shard=2)
        # append one epoch with fresh keys and publish
        spark.range(6000, 7000).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) * 0.5 AS v"
        ).coalesce(1).write.mode("append").parquet(p)
        published = {e["path"] for e in M.load_snapshot(p, 1)["files"]}
        new = sorted(
            f for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in published
        )
        M.append_snapshot(p, new)
        # pre-refresh: the new file is conservatively kept, not indexed
        plan0 = plan_point_lookup(p, "k", 6500)
        assert plan0["indexed_files"] == 6
        side2 = update_bloom_index(spark, p, "k", files_per_shard=2)
        assert set(side1["shards"]) <= set(side2["shards"])
        fresh = set(side2["shards"]) - set(side1["shards"])
        assert len(fresh) == 1, "exactly the new file's shard is new"
        with open(os.path.join(p, sorted(fresh)[0])) as fh:
            assert set(_json.load(fh)) == set(new)
        plan = plan_point_lookup(p, "k", 6500)
        assert plan["indexed_files"] == 7
        assert len(plan["keep"]) <= 2
        got = read_snapshot_point(spark, p, "k", 6500).collect()
        assert [(r["k"],) for r in got] == [(6500,)]
        # old keys still probe through the carried-over shards
        got0 = read_snapshot_point(spark, p, "k", 1234).collect()
        assert [(r["k"],) for r in got0] == [(1234,)]

    def test_refresh_is_noop_without_new_files(self, spark, arrival_table):
        from pandas_to_postgres_spark.sources.file_bloom import (
            build_bloom_index,
            update_bloom_index,
        )

        p = arrival_table
        side1 = build_bloom_index(spark, p, "k")
        before = sorted(f for f in os.listdir(p) if f.startswith("_bloom"))
        side2 = update_bloom_index(spark, p, "k")
        assert side2["shards"] == side1["shards"]
        assert sorted(
            f for f in os.listdir(p) if f.startswith("_bloom")
        ) == before

    def test_refresh_without_prior_index_builds_full(
        self, spark, arrival_table
    ):
        from pandas_to_postgres_spark.sources.file_bloom import (
            plan_point_lookup,
            update_bloom_index,
        )

        p = arrival_table
        update_bloom_index(spark, p, "k")
        assert plan_point_lookup(p, "k", 77)["indexed_files"] == 6

    def test_token_refresh_and_vacuum_keeps_reused_shards(
        self, spark, tmp_path
    ):
        from pyspark.sql import Row

        from pandas_to_postgres_spark.sources.file_bloom import (
            build_token_bloom_index,
            read_snapshot_contains,
            update_bloom_index,
        )

        p = str(tmp_path / "tok_inc")
        spark.createDataFrame(
            [Row(doc_id=i, text=f"alpha doc{i}") for i in range(50)]
        ).coalesce(1).write.parquet(p)
        M.publish_snapshot(p, ["doc_id"])
        build_token_bloom_index(spark, p, "text")
        spark.createDataFrame(
            [Row(doc_id=i, text=f"bravo doc{i}") for i in range(50, 90)]
        ).coalesce(1).write.mode("append").parquet(p)
        published = {e["path"] for e in M.load_snapshot(p, 1)["files"]}
        new = sorted(
            f for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in published
        )
        M.append_snapshot(p, new)
        side2 = update_bloom_index(spark, p, "text", tokens=True)
        # expiring v1 retires its sidecar; the v2 sidecar still
        # references v1-era shards, which vacuum must keep
        M.expire_snapshots(p, keep_latest=1)
        M.vacuum_orphans(p, grace_seconds=0)
        for s in side2["shards"]:
            assert os.path.exists(os.path.join(p, s)), s
        got = sorted(
            r["doc_id"]
            for r in read_snapshot_contains(
                spark, p, "text", "bravo"
            ).collect()
        )
        assert got == list(range(50, 90))
        got0 = sorted(
            r["doc_id"]
            for r in read_snapshot_contains(
                spark, p, "text", "alpha"
            ).collect()
        )
        assert got0 == list(range(50))


class TestRound9Hardening:
    """Round-9 ADVICE fixes: column-mapped builds, inline-sidecar
    migration, task-retry-safe shard writes, anchored shard
    classification, and corrupt-shard degradation."""

    def test_build_on_column_mapped_table(self, spark, arrival_table):
        """A metadata-only rename must not break (or mis-target) the
        index build: the build resolves the LOGICAL name through the
        snapshot's column map, probes prune, and results are exact."""
        p = arrival_table
        M.rename_snapshot_column(p, "k", "kk")
        side = build_bloom_index(spark, p, "kk")
        assert side["col"] == "kk"
        plan = plan_point_lookup(p, "kk", 1234)
        assert plan["indexed_files"] == 6
        assert 1 <= len(plan["keep"]) <= 2
        got = read_snapshot_point(spark, p, "kk", 1234).collect()
        assert [(r["kk"], r["v"]) for r in got] == [(1234, 617.0)]

    def test_build_missing_logical_column_raises(self, spark, arrival_table):
        with pytest.raises(ValueError, match="logical schema"):
            build_bloom_index(spark, arrival_table, "nope")

    def test_tag_validation_rejects_hostile_names(self, spark, arrival_table):
        """Tags are embedded in filenames: path separators and the
        '-shard-' classification marker must be unrepresentable."""
        for bad in ("a-shard-b", "a/b", "a b", "a.b"):
            with pytest.raises(ValueError, match="A-Za-z0-9_"):
                build_bloom_index(spark, arrival_table, bad)

    def test_anchored_shard_classification(self):
        assert M._is_bloom_shard_name(
            "_bloom-v3-k-shard-0123456789ab-00004-001.json"
        )
        # migration shard from update_bloom_index
        assert M._is_bloom_shard_name(
            "_bloom-v1-k-shard-000000000000-99999-000.json"
        )
        # top-level sidecars — including ones whose tag merely CONTAINS
        # '-shard-' — are not shards
        assert not M._is_bloom_shard_name("_bloom-v3-k.json")
        assert not M._is_bloom_shard_name("_bloom-v3-a-shard-b.json")

    def test_corrupt_shard_degrades_to_kept(self, spark, arrival_table):
        """A truncated shard (crashed writer, partial copy) must degrade
        its files to conservatively-kept, never crash the planner."""
        p = arrival_table
        side = build_bloom_index(spark, p, "k", files_per_shard=2)
        assert len(side["shards"]) >= 2
        victim = sorted(side["shards"])[0]
        with open(os.path.join(p, victim)) as fh:
            n_victim_files = len(__import__("json").load(fh))
        with open(os.path.join(p, victim), "w") as fh:
            fh.write('{"truncated')  # invalid JSON
        plan = plan_point_lookup(p, "k", 1234)
        assert plan["indexed_files"] == 6 - n_victim_files
        got = read_snapshot_point(spark, p, "k", 1234).collect()
        assert [(r["k"],) for r in got] == [(1234,)]

    def test_inline_sidecar_migrates_to_carried_shard(
        self, spark, arrival_table
    ):
        """Refreshing from a pre-shard INLINE sidecar must not orphan the
        inline bitsets: they materialize as a carried-over shard so the
        old files stay indexed after the refresh."""
        import json as _json

        p = arrival_table
        side = build_bloom_index(spark, p, "k")
        blooms = {}
        for s in side["shards"]:
            with open(os.path.join(p, s)) as fh:
                blooms.update(_json.load(fh))
            os.remove(os.path.join(p, s))
        legacy = {
            "col": "k", "m": side["m"], "k": side["k"],
            "version": side["version"], "files": blooms,
        }
        with open(
            os.path.join(p, f"_bloom-v{side['version']}-k.json"), "w"
        ) as fh:
            _json.dump(legacy, fh)
        # append a new epoch and refresh
        from pandas_to_postgres_spark.sources.file_bloom import (
            update_bloom_index,
        )

        spark.range(6000, 7000).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) * 0.5 AS v"
        ).coalesce(1).write.mode("append").parquet(p)
        published = {e["path"] for e in M.load_snapshot(p, 1)["files"]}
        new = sorted(
            f for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in published
        )
        M.append_snapshot(p, new)
        side2 = update_bloom_index(spark, p, "k")
        # every inline-covered file is now indexed through some shard
        shard_files = set()
        for s in side2["shards"]:
            with open(os.path.join(p, s)) as fh:
                shard_files.update(_json.load(fh))
        assert set(blooms) <= shard_files, (
            "inline bitsets must carry over as a shard"
        )
        plan = plan_point_lookup(p, "k", 1234)
        assert plan["indexed_files"] == 7
        got = read_snapshot_point(spark, p, "k", 1234).collect()
        assert [(r["k"],) for r in got] == [(1234,)]
