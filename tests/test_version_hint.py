"""Version-hint file (``_version-hint.text``, Iceberg's pattern): every
successful claim advances it, resolve-latest reads ONE file on the happy
path (plus a forward existence probe), and a stale/missing/corrupt hint
self-heals instead of serving an old head."""

import os

import pytest

from pandas_to_postgres_spark.sources import manifest as M


@pytest.fixture
def table(spark, tmp_path):
    p = str(tmp_path / "hint_tbl")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").coalesce(
        1
    ).write.parquet(p)
    M.publish_snapshot(p, ["k"])
    spark.range(100, 150).selectExpr("id AS k", "id * 2 AS v").coalesce(
        1
    ).write.mode("append").parquet(p)
    M.append_snapshot(p, [
        f for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
        and f not in {e["path"] for e in M.load_snapshot(p, 1)["files"]}
    ])
    return p


class TestVersionHint:
    def test_publish_writes_and_advances_hint(self, table):
        assert M._read_version_hint(table) == 2

    def test_resolve_latest_skips_the_listing_on_happy_path(
        self, table, monkeypatch
    ):
        def boom(_path):
            raise AssertionError(
                "happy path must not list manifest names"
            )

        monkeypatch.setattr(M, "snapshot_versions", boom)
        assert M._resolve_latest(table) == 2
        assert M.load_snapshot(table)["version"] == 2

    def test_stale_hint_probes_forward_to_true_head(self, table):
        """A hint written by a slower publisher (or an older engine) can
        lag the head — the forward probe must find the real latest."""
        with open(os.path.join(table, M._HINT_NAME), "w") as fh:
            fh.write("1")
        assert M._resolve_latest(table) == 2
        # and reading heals nothing silently wrong: explicit versions
        # still time-travel
        assert M.load_snapshot(table, 1)["version"] == 1

    def test_missing_hint_falls_back_to_listing(self, table):
        os.remove(os.path.join(table, M._HINT_NAME))
        assert M._resolve_latest(table) == 2
        assert M.load_snapshot(table)["version"] == 2

    def test_corrupt_hint_falls_back_to_listing(self, table):
        with open(os.path.join(table, M._HINT_NAME), "w") as fh:
            fh.write("not-a-version")
        assert M.load_snapshot(table)["version"] == 2

    def test_hint_pointing_at_expired_manifest_falls_back(self, table):
        """expire_snapshots removes old manifests; a hint stranded on one
        (hand-regressed here) must fall back, not crash."""
        M.expire_snapshots(table, keep_latest=1)
        with open(os.path.join(table, M._HINT_NAME), "w") as fh:
            fh.write("1")  # v1's manifest is gone
        assert M.load_snapshot(table)["version"] == 2

    def test_hint_never_regresses(self, table):
        M._write_version_hint(table, 1)
        assert M._read_version_hint(table) == 2

    def test_orphan_hint_tmp_is_vacuumed(self, table):
        tmp = os.path.join(table, f".{M._HINT_NAME}.deadbeef.tmp")
        with open(tmp, "w") as fh:
            fh.write("9")
        out = M.vacuum_orphans(table, grace_seconds=0)
        assert f".{M._HINT_NAME}.deadbeef.tmp" in out["deleted_files"]
        # the live hint itself is never an orphan
        assert os.path.exists(os.path.join(table, M._HINT_NAME))
