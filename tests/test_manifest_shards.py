"""Two-level (sharded) snapshot manifests — the Iceberg manifest-list
pattern over the filesystem log.

At 100 TB a snapshot references millions of part files; a single JSON
manifest per version makes every commit rewrite O(table) metadata and
every planning read parse it all. The sharded layout keeps entries in
immutable ``_mshard-*.json`` files reused BY REFERENCE across versions
(commits write O(touched) shards + a small manifest list) and prunes
whole shards at planning time from shard-level [min, max] stats.

These tests drive the layout with tiny thresholds (INLINE_MAX /
SHARD_TARGET are module constants precisely so the sharded code paths
are exercisable on toy tables) and assert:

- transparent correctness: every reader (read_snapshot, pruned reads,
  count, change feed diffs) sees byte-identical results either way;
- commit cost: an append reuses every full head shard and writes exactly
  one new shard; a rewrite (delete/merge/compact) rewrites only the
  shards whose files it touched;
- planning cost: a selective range scan opens only the shards whose
  aggregated range can match;
- lifecycle: expire retires shards referenced only by expired versions,
  vacuum age-sweeps orphan shards from lost claim retries, and both
  never touch a shard any retained snapshot references.
"""

import json
import os
import threading

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pandas_to_postgres_spark.sources import manifest as M


@pytest.fixture
def tiny_shards(monkeypatch):
    monkeypatch.setattr(M, "INLINE_MAX", 4)
    monkeypatch.setattr(M, "SHARD_TARGET", 4)


def _write_parts(spark, path, lo_hi_pairs, prefix="part-a"):
    """One single-row-group parquet file per (lo, hi) range, named
    deterministically so tests can reason about which file holds what."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    names = []
    for i, (lo, hi) in enumerate(lo_hi_pairs):
        t = pa.table(
            {
                "k": list(range(lo, hi)),
                "v": [float(x) * 0.5 for x in range(lo, hi)],
            }
        )
        name = f"{prefix}-{i:03d}.parquet"
        pq.write_table(t, os.path.join(path, name))
        names.append(name)
    return names


class TestShardedLayout:
    def test_upgrade_inline_to_sharded_at_threshold(self, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(3)])
        m = M.publish_snapshot(p, ["k"], files=names)
        assert "shards" not in m  # ≤ INLINE_MAX stays inline
        raw = json.load(open(tmp_path / "_manifest-v1.json"))
        assert "files" in raw and "shards" not in raw

        more = _write_parts(
            None, p, [(i * 10, i * 10 + 10) for i in range(3, 20)], "part-b"
        )
        m2 = M.append_snapshot(p, more)
        raw2 = json.load(open(tmp_path / "_manifest-v2.json"))
        assert "shards" in raw2 and "files" not in raw2
        assert len(raw2["shards"]) == 5  # ceil(20 / 4)
        assert sum(r["n"] for r in raw2["shards"]) == 20
        # the returned manifest and load_snapshot still expose "files"
        assert len(m2["files"]) == 20
        assert len(M.load_snapshot(p)["files"]) == 20

    def test_append_reuses_full_head_shards(self, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        m1 = M.publish_snapshot(p, ["k"], files=names)
        new = _write_parts(None, p, [(200, 210)], "part-new")
        m2 = M.append_snapshot(p, new)
        s1 = {r["path"] for r in m1["shards"]}
        s2 = {r["path"] for r in m2["shards"]}
        assert s1 <= s2, "append must reuse every full head shard by reference"
        assert len(s2 - s1) == 1, "append writes exactly one shard of new files"
        assert M.count_snapshot(p) == 210

    def test_append_fast_path_reads_no_shard_content(
        self, tmp_path, tiny_shards, monkeypatch
    ):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)
        new = _write_parts(None, p, [(200, 210)], "part-new")
        calls = []
        real = M._load_shard_entries
        monkeypatch.setattr(
            M, "_load_shard_entries", lambda *a: calls.append(a) or real(*a)
        )
        m2 = M.append_snapshot(p, new)
        assert calls == [], "O(new-files) append must not open any head shard"
        assert M.count_snapshot(p) == 210
        assert len(M.load_snapshot(p)["files"]) == 21
        assert m2["version"] == 2

    def test_small_shards_coalesce_after_many_epochs(
        self, tmp_path, tiny_shards, monkeypatch
    ):
        monkeypatch.setattr(M, "SHARD_TARGET", 8)  # small = n < 4
        monkeypatch.setattr(M, "_MERGE_SMALL_SHARDS_AT", 3)
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(6)])
        M.publish_snapshot(p, ["k"], files=names)  # 6 > INLINE_MAX=4 → sharded
        for i in range(6):  # six 1-file epochs
            new = _write_parts(None, p, [(100 + i * 10, 100 + i * 10 + 10)],
                               f"part-e{i}")
            M.append_snapshot(p, new)
        head = M.load_snapshot(p, materialize=False)
        # without merging there would be 1 + 6 = 7 refs; the merge folds
        # the small ones once more than 3 pile up
        assert len(head["shards"]) < 7, [r["n"] for r in head["shards"]]
        assert sum(r["n"] for r in head["shards"]) == 12
        assert M.count_snapshot(p) == 120
        # rows all present and exact
        assert len(M.load_snapshot(p)["files"]) == 12

    def test_count_reads_no_shard_content(self, tmp_path, tiny_shards, monkeypatch):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)

        calls = []
        real = M._load_shard_entries
        monkeypatch.setattr(
            M, "_load_shard_entries", lambda *a: calls.append(a) or real(*a)
        )
        assert M.count_snapshot(p) == 200
        assert calls == [], "count must come from the manifest list alone"

    def test_two_level_pruning_opens_matching_shards_only(
        self, tmp_path, tiny_shards, monkeypatch
    ):
        p = str(tmp_path)
        # key-sorted layout: file i owns [10i, 10i+10) → shard j owns [40j, 40j+40)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)

        calls = []
        real = M._load_shard_entries
        monkeypatch.setattr(
            M, "_load_shard_entries", lambda *a: calls.append(a[1]["path"]) or real(*a)
        )
        plan = M.plan_snapshot_scan(p, "k", 45, 47)
        assert plan["shards_total"] == 5
        assert plan["shards_read"] == 1
        assert len(calls) == 1, "only the one overlapping shard may be opened"
        assert [e["path"] for e in plan["keep"]] == ["part-a-004.parquet"]

    def test_pruned_read_matches_full_filter(self, spark, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)
        got = (
            M.read_snapshot_pruned(spark, p, "k", 33, 92)
            .orderBy("k")
            .collect()
        )
        want = (
            spark.read.parquet(*[os.path.join(p, n) for n in names])
            .filter((F.col("k") >= 33) & (F.col("k") <= 92))
            .orderBy("k")
            .collect()
        )
        assert got == want

    def test_empty_survivor_set_still_typed_empty(self, spark, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)
        out = M.read_snapshot_pruned(spark, p, "k", 10_000, 20_000)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["k", "v"]


class TestShardedRewrites:
    def test_delete_rewrites_only_touched_shards(self, spark, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        m1 = M.publish_snapshot(p, ["k"], files=names)
        keys = spark.createDataFrame([Row(k=55)])
        m2 = M.delete_snapshot_rows(spark, p, keys, ["k"])
        assert M.count_snapshot(p) == 199
        s1 = {r["path"] for r in m1["shards"]}
        s2 = {r["path"] for r in m2["shards"]}
        # file part-a-005 lives in shard 1; shards 0, 2, 3, 4 must carry over
        assert len(s1 & s2) == 4, "untouched shards must be reused by reference"
        # time travel to v1 still exact
        assert M.read_snapshot(spark, p, version=1).count() == 200

    def test_compact_then_read_all_versions(self, spark, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)
        M.compact_snapshot(spark, p, target_bytes=10**9)
        v1 = M.read_snapshot(spark, p, version=1).orderBy("k").collect()
        v2 = M.read_snapshot(spark, p, version=2).orderBy("k").collect()
        assert v1 == v2
        assert M.count_snapshot(p, version=2) == 200

    def test_merge_upsert_sharded(self, spark, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)
        ups = spark.createDataFrame(
            [Row(k=55, v=-1.0), Row(k=10_000, v=-2.0)]
        )
        M.merge_snapshot(spark, p, ups, ["k"])
        head = M.read_snapshot(spark, p)
        assert head.count() == 201
        assert head.filter("k = 55").first()["v"] == -1.0
        assert head.filter("k = 10000").first()["v"] == -2.0


class TestShardedLifecycle:
    def test_expire_retires_expired_only_shards(self, spark, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)
        M.compact_snapshot(spark, p, target_bytes=10**9)  # v2: all-new files
        v1_shards = {
            r["path"]
            for r in M.load_snapshot(p, 1, materialize=False)["shards"]
        }
        res = M.expire_snapshots(p, keep_latest=1)
        assert res["expired_versions"] == [1]
        assert set(res["deleted_shards"]) == v1_shards
        for s in v1_shards:
            assert not os.path.exists(os.path.join(p, s))
        # head still reads
        assert M.read_snapshot(spark, p).count() == 200

    def test_expire_keeps_shards_shared_with_retained(self, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        m1 = M.publish_snapshot(p, ["k"], files=names)
        new = _write_parts(None, p, [(200, 210)], "part-new")
        M.append_snapshot(p, new)  # v2 reuses v1's shards
        res = M.expire_snapshots(p, keep_latest=1)
        assert res["expired_versions"] == [1]
        assert res["deleted_shards"] == []
        for r in m1["shards"]:
            assert os.path.exists(os.path.join(p, r["path"]))

    def test_vacuum_sweeps_orphan_shards_age_gated(self, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)
        orphan = os.path.join(p, "_mshard-deadbeefdeadbeef.json")
        with open(orphan, "w") as fh:
            json.dump([], fh)
        young = M.vacuum_orphans(p, grace_seconds=3600)
        assert os.path.basename(orphan) in young["kept_young_orphans"]
        swept = M.vacuum_orphans(p, grace_seconds=0)
        assert os.path.basename(orphan) in swept["deleted_files"]
        assert not os.path.exists(orphan)
        # referenced shards survive a zero-grace vacuum
        for r in M.load_snapshot(p, materialize=False)["shards"]:
            assert os.path.exists(os.path.join(p, r["path"]))

    def test_concurrent_appends_both_survive_sharded(self, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)
        a = _write_parts(None, p, [(300, 310)], "part-wa")
        b = _write_parts(None, p, [(400, 410)], "part-wb")
        barrier = threading.Barrier(2)
        errs = []

        def run(new):
            try:
                barrier.wait()
                M.append_snapshot(p, new)
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        t1 = threading.Thread(target=run, args=(a,))
        t2 = threading.Thread(target=run, args=(b,))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert not errs
        head = M.load_snapshot(p)
        have = {e["path"] for e in head["files"]}
        assert set(a) <= have and set(b) <= have
        assert M.count_snapshot(p) == 220


class TestShardedDataSource:
    """format('snapshot') over a SHARDED manifest: the standard reader
    API sees identical rows, and pushFilters prunes at shard level
    before opening any shard content."""

    def _table(self, spark, tmp_path):
        p = str(tmp_path / "sharded_ds")
        os.makedirs(p, exist_ok=True)
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(20)])
        M.publish_snapshot(p, ["k"], files=names)
        return p

    def test_reads_and_prunes_sharded(self, spark, tmp_path, tiny_shards, monkeypatch):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
            SnapshotReader,
        )

        p = self._table(spark, tmp_path)
        spark.dataSource.register(SnapshotDataSource)
        df = spark.read.format("snapshot").option("path", p).load()
        assert df.count() == 200
        assert df.agg(F.sum("k")).first()[0] == sum(range(200))

        # planning-level: pushed range must survive shard-level pruning
        r = SnapshotReader({"path": p}, ["k", "v"])
        from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

        list(r.pushFilters([GreaterThanOrEqual(("k",), 45),
                            LessThanOrEqual(("k",), 47)]))
        calls = []
        real = M._load_shard_entries
        monkeypatch.setattr(
            M, "_load_shard_entries",
            lambda *a: calls.append(a[1]["path"]) or real(*a),
        )
        parts = r.partitions()
        assert len(parts) == 1
        assert parts[0].value[0].endswith("part-a-004.parquet")
        assert len(calls) == 1, "only the overlapping shard may be opened"

    def test_timestamp_as_of_option(self, spark, tmp_path, tiny_shards):
        import time

        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        p = self._table(spark, tmp_path)
        t_between = time.time()
        time.sleep(0.02)
        more = _write_parts(None, p, [(500, 510)], "part-late")
        M.append_snapshot(p, more)
        spark.dataSource.register(SnapshotDataSource)
        old = (
            spark.read.format("snapshot")
            .option("path", p)
            .option("timestampAsOf", t_between)
            .load()
        )
        assert old.count() == 200
        now = (
            spark.read.format("snapshot")
            .option("path", p)
            .option("timestampAsOf", time.time())
            .load()
        )
        assert now.count() == 210
        with pytest.raises(Exception, match="at most one"):
            (
                spark.read.format("snapshot")
                .option("path", p)
                .option("version", 1)
                .option("timestampAsOf", t_between)
                .load()
                .count()
            )


class TestAsOfTimestamp:
    def test_as_of_resolves_to_newest_not_after(self, tmp_path):
        import time

        p = str(tmp_path)
        names = _write_parts(None, p, [(0, 10)])
        M.publish_snapshot(p, ["k"], files=names)
        t_between = time.time()
        time.sleep(0.02)
        more = _write_parts(None, p, [(10, 20)], "part-b")
        M.append_snapshot(p, more)
        assert M.snapshot_as_of(p, time.time()) == 2
        assert M.snapshot_as_of(p, t_between) == 1
        with pytest.raises(ValueError):
            M.snapshot_as_of(p, -1.0)


class TestRewriteManifests:
    """rewrite_manifests: explicit metadata-only shard repack (Iceberg's
    rewrite_manifests procedure)."""

    def _fragmented_table(self, p):
        """10 single-file appends past INLINE_MAX → ~1 tiny shard each."""
        names = _write_parts(None, p, [(i * 10, i * 10 + 10) for i in range(6)])
        M.publish_snapshot(p, ["k"], files=names)
        for i in range(6, 16):
            new = _write_parts(None, p, [(i * 10, i * 10 + 10)], f"part-e{i}")
            M.append_snapshot(p, new)
        return M.load_snapshot(p)

    def test_repacks_to_target_metadata_only(self, tmp_path, tiny_shards):
        p = str(tmp_path)
        head = self._fragmented_table(p)
        raw = json.load(open(os.path.join(p, f"_manifest-v{head['version']}.json")))
        n_before = len(raw["shards"])
        assert n_before > 4  # fragmented by the single-file appends
        out = M.rewrite_manifests(p)
        assert out["version"] == head["version"] + 1
        assert out["data_change"] is False
        raw2 = json.load(open(os.path.join(p, f"_manifest-v{out['version']}.json")))
        assert len(raw2["shards"]) == 4  # ceil(16 / SHARD_TARGET=4)
        assert all(int(r["n"]) <= 4 for r in raw2["shards"])
        # byte-identical table: same entries, same count
        assert {e["path"] for e in out["files"]} == {
            e["path"] for e in head["files"]
        }
        assert M.count_snapshot(p) == 160
        # prior version still time-travels over its own shards
        assert len(M.load_snapshot(p, head["version"])["files"]) == 16

    def test_noop_on_inline_manifest(self, tmp_path, tiny_shards):
        p = str(tmp_path)
        names = _write_parts(None, p, [(0, 10), (10, 20)])
        M.publish_snapshot(p, ["k"], files=names)
        out = M.rewrite_manifests(p)
        assert out["version"] == 1  # nothing published

    def test_old_shards_survive_until_expiry(self, tmp_path, tiny_shards):
        p = str(tmp_path)
        head = self._fragmented_table(p)
        M.rewrite_manifests(p)
        M.vacuum_orphans(p, grace_seconds=0)
        # old versions still reference the fragmented shards → kept
        assert len(M.load_snapshot(p, head["version"])["files"]) == 16
        M.expire_snapshots(p, keep_latest=1)
        out = M.vacuum_orphans(p, grace_seconds=0)
        assert len(M.load_snapshot(p)["files"]) == 16  # head intact

    def test_rewrite_racing_append_repacks_the_posterior_head(
        self, tmp_path, tiny_shards, monkeypatch
    ):
        """TOCTOU audit (same class as the r9 constraint finding, proven
        absent here): a rewrite that loses its version claim to a
        concurrent append must RE-READ the new head and repack the
        append's entries too — never publish a shard layout computed from
        the pre-append file list (which would make the appended rows
        vanish from the repacked version). The patched ``_claim_version``
        fires the rival append through the REAL claim path at the instant
        the rewrite makes its first claim, so the rewrite deterministically
        loses and retries."""
        p = str(tmp_path)
        head = self._fragmented_table(p)
        rival = _write_parts(None, p, [(160, 170)], "part-rival")
        real = M._claim_version
        state = {"armed": True}

        def claim(path, version, manifest):
            if state["armed"] and manifest.get("data_change") is False:
                state["armed"] = False  # the rival's own claim passes through
                M.append_snapshot(p, rival)
            return real(path, version, manifest)

        monkeypatch.setattr(M, "_claim_version", claim)
        out = M.rewrite_manifests(p)
        # the rewrite lost one claim to the append, then repacked v(+2)
        assert out["version"] == head["version"] + 2
        assert out["data_change"] is False
        assert rival[0] in {e["path"] for e in out["files"]}
        raw = json.load(
            open(os.path.join(p, f"_manifest-v{out['version']}.json"))
        )
        assert len(raw["shards"]) == 5  # ceil(17 / SHARD_TARGET=4), packed
        assert sum(int(r["n"]) for r in raw["shards"]) == 17
        assert M.count_snapshot(p) == 170  # appended rows survive the repack
