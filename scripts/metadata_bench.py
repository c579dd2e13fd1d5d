"""Metadata-plane scaling of the snapshot manifest log (no Spark needed).

At 100 TB a snapshot references ~10^5–10^6 part files; the metadata plane —
not the data plane — then dominates commit latency and planning time unless
commits are O(touched) and planning is O(matching). This bench measures
exactly that on the two manifest layouts:

- INLINE (one JSON per version with every entry): append commit rewrites
  O(table) metadata; a range-scan plan parses O(table) entries.
- SHARDED (manifest list + reusable entry shards, the Iceberg pattern):
  append writes ONE new shard + a small list; planning opens only shards
  whose aggregated [min, max] overlaps the predicate.

Run: python scripts/metadata_bench.py [n_files ...]   (default 1000 8000)
Prints one JSON line per (layout, n_files): publish, append, plan times.

The parquet files themselves are one-row dummies — the point is manifest
entry COUNT, which is what commit/planning metadata I/O scales with.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from pandas_to_postgres_spark.sources import manifest as M  # noqa: E402


def build_table(n_files: int) -> str:
    d = tempfile.mkdtemp(prefix=f"metabench-{n_files}-")
    # one template file, hard-linked n times: entry count is what matters,
    # and every entry still gets real footer stats on first harvest
    tmpl = os.path.join(d, "part-00000.parquet")
    pq.write_table(pa.table({"k": [0], "v": [0.0]}), tmpl)
    for i in range(1, n_files):
        os.link(tmpl, os.path.join(d, f"part-{i:05d}.parquet"))
    return d


def fake_entries(n_files: int):
    """Pre-harvested entries with disjoint k-ranges (file i owns
    [10i, 10i+10)) — isolates MANIFEST cost from footer-read cost."""
    return [
        {
            "path": f"part-{i:05d}.parquet",
            "bytes": 1000,
            "rows": 10,
            "stats": {"k": [i * 10, i * 10 + 9]},
        }
        for i in range(n_files)
    ]


def run(n_files: int, sharded: bool) -> dict:
    M.INLINE_MAX = 10**9 if not sharded else 0
    M.SHARD_TARGET = 1000
    d = build_table(n_files + 1)
    entries = fake_entries(n_files)
    names = [e["path"] for e in entries]

    t0 = time.perf_counter()
    M.publish_snapshot(d, ["k"], files=names, known_entries=entries)
    t_publish = time.perf_counter() - t0

    t0 = time.perf_counter()
    M.append_snapshot(d, [f"part-{n_files:05d}.parquet"])
    t_append = time.perf_counter() - t0

    t0 = time.perf_counter()
    plan = M.plan_snapshot_scan(d, "k", 55, 65)
    t_plan = time.perf_counter() - t0

    out = {
        "layout": "sharded" if sharded else "inline",
        "n_files": n_files,
        "publish_s": round(t_publish, 4),
        "append_commit_s": round(t_append, 4),
        "plan_range_scan_s": round(t_plan, 4),
        "plan_files_kept": len(plan["keep"]),
        "shards_total": plan["shards_total"],
        "shards_read": plan["shards_read"],
    }
    shutil.rmtree(d, ignore_errors=True)
    return out


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1000, 8000]
    for n in sizes:
        for sharded in (False, True):
            print(json.dumps(run(n, sharded)))
