"""Per-file Bloom-filter index for snapshot tables — point lookups on
columns the min/max manifest stats cannot prune.

Manifest [min, max] envelopes prune RANGE scans on clustered layouts, but
a point lookup on a high-cardinality column in ARRIVAL-ordered data (the
streaming-ingest steady state: every epoch file spans the whole key
domain) keeps every file — each file's envelope covers everything. Table
formats solve this with per-file value sketches (Iceberg puffin blobs,
Delta's BLOOMFILTER index, Parquet's own optional bloom pages consulted
at planning): a tiny bitset per file answers "might this file contain
key X?" at PLANNING time, so an equality lookup schedules only the files
whose filter claims membership (plus bounded false positives — pruning
stays a superset guarantee; the exact predicate re-applies on the scan).

This module is that design on the manifest log:

- :func:`build_bloom_index` scans the chosen snapshot ONCE (distributed:
  per-row positions fold to per-file DISTINCT position sets map-side),
  assembles one bitset per file, and writes an immutable sidecar
  ``_bloom-v{N}-{col}.json`` next to the manifests. Data files are
  immutable, so the sidecar never goes stale for its version — and since
  appends only ADD files, a LATER version can still consult it for the
  files it covers (uncovered files are conservatively kept).
- :func:`read_snapshot_point` computes the probe's k positions in
  Python (md5-derived, the same replayable-in-planning rule the hidden
  partitioning bucket transform uses — no Spark round trip), keeps files
  whose bitset has every bit, and re-applies the exact equality.

Sizing: m = 2**17 bits (16 KiB) per file and k = 5 hashes give ~0.1%
false-positive rate at 10k distinct keys per file — one 100 MB parquet
file of typical rows carries a sketch 4 orders of magnitude smaller than
itself. At 100 TB the sidecar assembly (collect of per-file position
sets) would move into a distributed writer like the manifest shards;
the PROBE side — one JSON read + k bit tests per file — is already the
O(files) planning-time path that matters.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

M_BITS = 1 << 17
K_HASHES = 5


def _positions_py(value: Any, m: int = M_BITS, k: int = K_HASHES) -> list[int]:
    """The probe's bit positions — md5 of ``str(value) + ':' + j``, first
    32 bits, mod m. Mirrored exactly by the Spark expression in
    :func:`build_bloom_index`; parity is pinned by tests."""
    return [
        int(hashlib.md5(f"{value}:{j}".encode()).hexdigest()[:8], 16) % m
        for j in range(k)
    ]


def _bloom_name(version: int, col: str) -> str:
    return f"_bloom-v{version}-{col}.json"


def build_bloom_index(
    spark: SparkSession,
    path: str,
    col: str,
    version: int | None = None,
    m: int = M_BITS,
    k: int = K_HASHES,
) -> dict:
    """One distributed scan of the snapshot → one Bloom bitset per file,
    published as an immutable sidecar for (version, col). Positions are
    md5-derived so the Python planner can replay them; the per-file
    DISTINCT position sets fold map-side before the bounded collect
    (≤ k·distinct-keys positions per file, each < m)."""
    from pandas_to_postgres_spark.sources.manifest import load_snapshot

    snap = load_snapshot(path, version)
    v = snap["version"]
    files = [os.path.join(path, e["path"]) for e in snap["files"]]
    df = spark.read.parquet(*files).select(
        F.col(col).cast("string").alias("__v"),
        F.col("_metadata.file_path").alias("__f"),
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__j")
    pos = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("__v"), F.lit(":"), F.col("__j"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % m
    ).alias("__p")
    per_file = (
        df.select("__f", "__v", j)
        .select("__f", pos)
        .groupBy("__f")
        .agg(F.collect_set("__p").alias("__ps"))
        .collect()
    )
    blooms: dict[str, str] = {}
    for r in per_file:
        bits = bytearray(m // 8)
        for p in r["__ps"]:
            bits[p // 8] |= 1 << (p % 8)
        blooms[os.path.basename(r["__f"])] = base64.b64encode(
            bytes(bits)
        ).decode()
    sidecar = {"col": col, "m": m, "k": k, "version": v, "files": blooms}
    name = _bloom_name(v, col)
    tmp = os.path.join(path, f".{name}.tmp")
    with open(tmp, "w") as fh:
        json.dump(sidecar, fh)
    os.replace(tmp, os.path.join(path, name))
    return sidecar


def _load_bloom(path: str, col: str, max_version: int) -> dict | None:
    """Newest sidecar for ``col`` at or below ``max_version`` (files are
    immutable, so an older sidecar stays valid for the files it covers)."""
    best = None
    for f in os.listdir(path):
        if f.startswith("_bloom-v") and f.endswith(f"-{col}.json"):
            try:
                v = int(f.split("-")[1][1:])
            except ValueError:
                continue
            if v <= max_version and (best is None or v > best[0]):
                best = (v, f)
    if best is None:
        return None
    with open(os.path.join(path, best[1])) as fh:
        return json.load(fh)


def plan_point_lookup(
    path: str, col: str, value: Any, version: int | None = None
) -> dict:
    """Planning-time file pruning for an equality probe: a file is kept
    only if its bitset has ALL k probe bits (or it has no bitset —
    appended after the index was built, conservatively kept). Returns
    {"keep": entries, "total_files", "indexed_files"}."""
    from pandas_to_postgres_spark.sources.manifest import load_snapshot

    snap = load_snapshot(path, version)
    bloom = _load_bloom(path, col, snap["version"])
    if bloom is None:
        return {
            "keep": list(snap["files"]),
            "total_files": len(snap["files"]),
            "indexed_files": 0,
        }
    probe = _positions_py(value, bloom["m"], bloom["k"])
    keep, indexed = [], 0
    for e in snap["files"]:
        b64 = bloom["files"].get(e["path"])
        if b64 is None:
            keep.append(e)  # not covered by the sidecar: keep
            continue
        indexed += 1
        bits = base64.b64decode(b64)
        if all(bits[p // 8] & (1 << (p % 8)) for p in probe):
            keep.append(e)
    return {
        "keep": keep,
        "total_files": len(snap["files"]),
        "indexed_files": indexed,
    }


def read_snapshot_point(
    spark: SparkSession,
    path: str,
    col: str,
    value: Any,
    version: int | None = None,
) -> DataFrame:
    """Point lookup through the Bloom sidecar: scan only the files whose
    filter claims the key (false positives are filtered by the exact
    predicate — superset guarantee, as with stats and partition
    pruning). An all-pruned probe still returns a correctly-typed empty
    frame."""
    from pandas_to_postgres_spark.sources.manifest import load_snapshot

    plan = plan_point_lookup(path, col, value, version)
    entries = plan["keep"] or load_snapshot(path, version)["files"][:1]
    df = spark.read.parquet(*[os.path.join(path, e["path"]) for e in entries])
    pred = F.col(col) == F.lit(value)
    if not plan["keep"]:
        pred = pred & F.lit(False)
    return df.filter(pred)
