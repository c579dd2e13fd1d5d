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
    files = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    entries = []
    for f in files:
        full = os.path.join(path, f)
        entries.append(
            {
                "path": f,
                "bytes": os.path.getsize(full),
                "stats": _file_stats(full, stat_cols),
            }
        )
    manifest = {"stat_cols": list(stat_cols), "files": entries}
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
