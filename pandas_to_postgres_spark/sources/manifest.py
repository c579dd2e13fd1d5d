"""File-level data skipping via a min/max manifest (lakehouse-style).

Spark's parquet reader already skips ROW GROUPS whose footer statistics
exclude a pushed predicate — but it still opens every file to read that
footer, and at 100 TB the file listing + footer reads alone are minutes of
driver/executor time. Table formats (Iceberg/Delta/Hudi) fix this by
keeping per-file column statistics in a manifest consulted at PLANNING
time, so a selective range scan touches only the files that can match.
This module is that pattern, self-contained over plain parquet:

- ``write_manifest(path, stat_cols)`` harvests per-file min/max for the
  given columns FROM THE PARQUET FOOTERS ALREADY WRITTEN (no data
  re-scan — pyarrow reads each footer's row-group statistics and folds
  them to file level) into ``_manifest.json`` beside the files.
- ``read_pruned(spark, path, col, lo, hi)`` loads the manifest, keeps the
  files whose [min, max] overlaps [lo, hi], and hands ONLY those paths to
  ``spark.read.parquet`` — the exact predicate must still be applied on
  top (pruning is a superset guarantee, same contract as partition
  pruning). Files with no statistics for the column are conservatively
  kept.

Layout synergy: after ``sinks/files.write_sorted`` (range-partitioned) or
a Z-order export, each file owns a narrow key range, so a selective range
predicate keeps O(1) of the files; on unsorted data the manifest still
never yields wrong results, it just prunes less. The manifest is a plain
JSON file rewritten atomically (tmp + rename) on each publish — the
single-table, single-writer case; real multi-writer tables need a log,
which is the jump to an actual table format, not more code here.

Snapshots / time travel (``publish_snapshot`` / ``read_snapshot``):
each publish freezes the CURRENT file list (plus stats) as an immutable
``_manifest-v{N}.json``; appends create new part files and a new version,
and any older version remains exactly readable — the Iceberg-style
snapshot-isolation contract, minus the multi-writer log. Readers resolve
"latest" by listing manifest names (at object-store scale a version-hint
file avoids the listing; local single-writer doesn't need it). Physical
cleanup is explicit and separate (``expire_snapshots``): retire old
manifests, then delete only files no RETAINED snapshot references —
readers of retained versions are never broken by a publish, only by an
expire, which is the same contract as Iceberg's expire_snapshots +
remove_orphan_files.
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_manifest.json"


def _file_stats(pq_path: str, stat_cols: Sequence[str]) -> dict[str, Any]:
    """Fold one parquet file's row-group footer stats to file-level min/max.

    Returns {col: [min, max]} for columns where every row group carries
    usable statistics; a column missing stats in ANY row group is omitted
    (the reader then conservatively keeps the file)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(pq_path).metadata
    name_to_idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
    out: dict[str, Any] = {}
    for col in stat_cols:
        idx = name_to_idx.get(col)
        if idx is None:
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if ok and lo is not None:
            out[col] = [lo, hi]
    return out


def write_manifest(path: str, stat_cols: Sequence[str]) -> dict:
    """Build ``_manifest.json`` for every ``part-*.parquet`` under ``path``
    (non-recursive — partitioned layouts keep their partition pruning;
    this targets flat exports like ``write_sorted``'s). Atomic publish via
    tmp + rename. Returns the manifest dict."""
    manifest = {
        "stat_cols": list(stat_cols),
        "files": _collect_entries(path, stat_cols),
    }
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, default=str)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return manifest


def load_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        return json.load(fh)


def prune_files(manifest: dict, col: str, lo: Any, hi: Any) -> tuple[list, int]:
    """(surviving file entries, total file count) for range [lo, hi] on
    ``col``. A file survives when its [min, max] overlaps the range or it
    has no stats for the column (conservative)."""
    keep = []
    for e in manifest["files"]:
        st = e["stats"].get(col)
        if st is None or not (hi < type(hi)(st[0]) or lo > type(lo)(st[1])):
            keep.append(e)
    return keep, len(manifest["files"])


def read_pruned(
    spark: SparkSession, path: str, col: str, lo: Any, hi: Any
) -> DataFrame:
    """Scan only the files whose manifest range overlaps [lo, hi], with the
    exact predicate re-applied on top (pruning is a superset guarantee).

    An empty survivor set still returns a correctly-typed empty frame (one
    file is read for schema, filtered to nothing by the predicate)."""
    from pyspark.sql import functions as F

    manifest = load_manifest(path)
    keep, total = prune_files(manifest, col, lo, hi)
    entries = keep or manifest["files"][:1]
    paths = [os.path.join(path, e["path"]) for e in entries]
    df = spark.read.parquet(*paths)
    pred = (F.col(col) >= lo) & (F.col(col) <= hi)
    if not keep:
        pred = pred & F.lit(False)
    return df.filter(pred)


# ------------------------------------------------------- snapshots

_SNAP_RE = r"_manifest-v(\d+)\.json$"


def _collect_entries(path: str, stat_cols: Sequence[str]) -> list[dict]:
    files = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    return [
        {
            "path": f,
            "bytes": os.path.getsize(os.path.join(path, f)),
            "stats": _file_stats(os.path.join(path, f), stat_cols),
        }
        for f in files
    ]


def snapshot_versions(path: str) -> list[int]:
    """Ascending list of published snapshot versions."""
    import re

    out = []
    for f in os.listdir(path):
        m = re.match(_SNAP_RE, f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def publish_snapshot(
    path: str, stat_cols: Sequence[str], files: Sequence[str] | None = None
) -> dict:
    """Freeze a file list (with footer stats) as the next immutable
    ``_manifest-v{N}.json``. Files already listed by an earlier snapshot
    keep serving that snapshot — a publish never rewrites or invalidates
    prior versions. Atomic via tmp + rename.

    ``files`` (file NAMES under ``path``) restricts the snapshot to an
    explicit subset instead of the whole directory listing — the hook
    :func:`compact_snapshot` needs, since after a compaction both the old
    and the rewritten part files coexist on disk (old snapshots still
    time-travel over the old files) but the new snapshot must reference
    only the rewritten ones."""
    versions = snapshot_versions(path)
    version = (versions[-1] if versions else 0) + 1
    if files is None:
        entries = _collect_entries(path, stat_cols)
    else:
        entries = [
            {
                "path": f,
                "bytes": os.path.getsize(os.path.join(path, f)),
                "stats": _file_stats(os.path.join(path, f), stat_cols),
            }
            for f in sorted(files)
        ]
    manifest = {
        "version": version,
        "stat_cols": list(stat_cols),
        "files": entries,
    }
    name = f"_manifest-v{version}.json"
    tmp = os.path.join(path, name + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, default=str)
    os.replace(tmp, os.path.join(path, name))
    return manifest


def load_snapshot(path: str, version: int | None = None) -> dict:
    """Load a snapshot manifest; latest when ``version`` is None."""
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshots published under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"snapshot v{v} not found (have {versions})")
    with open(os.path.join(path, f"_manifest-v{v}.json")) as fh:
        return json.load(fh)


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel scan: exactly the files the chosen snapshot froze —
    rows appended after its publish are invisible, regardless of what
    part files sit in the directory now."""
    snap = load_snapshot(path, version)
    paths = [os.path.join(path, e["path"]) for e in snap["files"]]
    if not paths:
        raise ValueError(
            f"snapshot v{snap['version']} of {path} froze zero files — "
            "published on an empty directory; there is no schema to read"
        )
    return spark.read.parquet(*paths)


def read_snapshot_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo: Any,
    hi: Any,
    version: int | None = None,
) -> DataFrame:
    """Time travel + file skipping in one: prune the chosen snapshot's
    file list by the manifest stats, re-apply the exact predicate on top
    (superset guarantee, as in :func:`read_pruned`)."""
    from pyspark.sql import functions as F

    snap = load_snapshot(path, version)
    if not snap["files"]:
        raise ValueError(
            f"snapshot v{snap['version']} of {path} froze zero files — "
            "published on an empty directory; there is no schema to read"
        )
    keep, _total = prune_files(snap, col, lo, hi)
    entries = keep or snap["files"][:1]
    paths = [os.path.join(path, e["path"]) for e in entries]
    df = spark.read.parquet(*paths)
    pred = (F.col(col) >= lo) & (F.col(col) <= hi)
    if not keep:
        pred = pred & F.lit(False)
    return df.filter(pred)


def expire_snapshots(path: str, keep_latest: int = 1) -> dict:
    """Retire all but the newest ``keep_latest`` snapshots, then delete
    part files that are provably superseded: referenced by an EXPIRED
    snapshot and by no retained one. The only operation that can break a
    time-travel reader — which is the point: publishes are
    non-destructive, space reclamation is explicit.

    Deliberately NOT deleted (the Iceberg remove_orphan_files race):
    files referenced by NO manifest at all — they may be a writer's
    freshly-appended data awaiting its publish — and files the legacy
    ``_manifest.json`` still references (``read_pruned`` readers).
    Returns {"expired_versions": [...], "deleted_files": [...]}."""
    if keep_latest < 1:
        raise ValueError("keep_latest must be >= 1")
    versions = snapshot_versions(path)
    retained = versions[-keep_latest:]
    expired = [v for v in versions if v not in retained]
    keep_refs: set[str] = set()
    for v in retained:
        keep_refs.update(e["path"] for e in load_snapshot(path, v)["files"])
    if os.path.exists(os.path.join(path, MANIFEST_NAME)):
        keep_refs.update(e["path"] for e in load_manifest(path)["files"])
    expired_refs: set[str] = set()
    for v in expired:
        expired_refs.update(e["path"] for e in load_snapshot(path, v)["files"])
    deleted = []
    for f in sorted(expired_refs - keep_refs):
        full = os.path.join(path, f)
        if os.path.exists(full):
            os.remove(full)
            deleted.append(f)
    for v in expired:
        os.remove(os.path.join(path, f"_manifest-v{v}.json"))
    return {"expired_versions": expired, "deleted_files": deleted}


def compact_snapshot(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    version: int | None = None,
) -> dict:
    """Small-files compaction (the lakehouse OPTIMIZE): rewrite the chosen
    snapshot's part files into ~``target_bytes`` files and publish the
    result as a NEW snapshot referencing only the rewritten files. The
    third leg of the maintenance contract next to publish (append) and
    expire (reclaim):

    - non-destructive: source part files stay on disk, so every prior
      snapshot still time-travels bit-exactly; space comes back later via
      :func:`expire_snapshots`, which sees the old files as referenced
      only by expired versions;
    - crash-safe: rewritten files land under unique ``part-c{N}-`` names
      via Spark's own committed write to a staging dir, then move into
      ``path`` BEFORE the manifest publish (the rename is the commit —
      a crash in between leaves orphan data files that expire_snapshots
      deliberately never deletes, and no manifest references them);
    - stats-preserving: footer min/max are recomputed for the rewritten
      files, so :func:`read_snapshot_pruned` skips files exactly as
      before (coarser envelopes, same superset guarantee).

    At 100 TB this is the nightly job that keeps a streaming-ingested
    table scannable: micro-batch appends publish thousands of small
    files/day; one coalesced rewrite pass restores ~row-group-sized
    files without blocking readers on any version. Returns the new
    manifest dict.
    """
    import shutil
    import tempfile

    snap = load_snapshot(path, version)
    names = [e["path"] for e in snap["files"]]
    if not names:
        raise ValueError("snapshot has no files to compact")
    total = sum(int(e.get("bytes", 0)) for e in snap["files"])
    n_out = max(1, -(-total // max(1, target_bytes)))
    src = spark.read.parquet(*[os.path.join(path, f) for f in names])
    new_version = snapshot_versions(path)[-1] + 1
    stage = tempfile.mkdtemp(prefix="compact-stage-")
    try:
        src.coalesce(n_out).write.mode("overwrite").parquet(stage)
        parts = sorted(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        moved = []
        for i, f in enumerate(parts):
            name = f"part-c{new_version}-{i:05d}.parquet"
            shutil.move(os.path.join(stage, f), os.path.join(path, name))
            moved.append(name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return publish_snapshot(path, snap["stat_cols"], files=moved)
