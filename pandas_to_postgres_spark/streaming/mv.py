"""Incremental materialized-view maintenance over the snapshot change
feed — the medallion (bronze → silver) pipeline composed from this
repo's own table format:

- BRONZE is a snapshot table; every publish is a change-feed micro-batch
  (``readStream.format("snapshot")`` — versions are the offsets).
- SILVER is a second snapshot table holding a keyed rollup. Each
  micro-batch folds to per-key partials and lands through ONE
  copy-on-write :func:`~pandas_to_postgres_spark.sources.manifest.merge_snapshot`
  — old totals + partials for touched keys, inserts for new keys — so
  batch readers always see a consistent rollup and can time-travel to
  any refresh boundary.
- Exactly-once across foreachBatch's at-least-once redelivery WITHOUT a
  side ledger: silver carries an ``applied_batch`` stamp per key, and a
  partial is added only where ``applied_batch < batch_id`` — a replayed
  batch (same id) finds its keys already stamped and merges nothing.
  Structured Streaming redelivers only the last uncommitted batch, so
  the single stamp column is sufficient state.

At 100 TB: the per-batch work is bounded by the BATCH (partials fold
map-side before any shuffle) plus a merge that rewrites only the silver
files containing touched keys — never a re-aggregation of bronze. That
is the whole point of incremental view maintenance: refresh cost tracks
the delta, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rollup_partials(batch_df: DataFrame) -> DataFrame:
    """Per-key partials of one change-feed batch (integer cents — the
    rollup must be exact across any batch slicing)."""
    return batch_df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).cast("long").alias("value_cents"),
    )


def silver_rollup_writer(silver_path: str):
    """foreachBatch writer maintaining the silver rollup snapshot table
    (see module docstring for the exactly-once stamp contract)."""
    import os

    from pandas_to_postgres_spark.sources.manifest import (
        merge_snapshot,
        publish_snapshot,
        read_snapshot,
        snapshot_versions,
    )

    def _writer(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # persist (NOT an eager localCheckpoint, r11): the partials (one
        # row per event_type) are consumed twice (isEmpty probe +
        # write/merge) — without a barrier each consumer re-runs the
        # batch aggregation, but the eager checkpoint ran the whole
        # aggregation as its OWN job before either consumer. persist
        # materializes inside the probe/merge passes instead (their
        # shared shuffle is reused across the actions), one job fewer
        # per micro-batch; lifetime bounded by the try/finally.
        part = rollup_partials(batch_df).persist()
        try:
            if part.isEmpty():
                return
            os.makedirs(silver_path, exist_ok=True)
            if not snapshot_versions(silver_path):
                # bootstrap: the first refresh IS the table
                part.withColumn(
                    "applied_batch", F.lit(batch_id).cast("long")
                ).coalesce(1).write.mode("overwrite").parquet(silver_path)
                publish_snapshot(silver_path, ["event_type"])
                return
            cur = read_snapshot(spark, silver_path).select(
                "event_type",
                F.col("n").alias("old_n"),
                F.col("value_cents").alias("old_c"),
                "applied_batch",
            )
            updates = (
                part.join(F.broadcast(cur), "event_type", "left")
                # redelivery guard: keys this batch already stamped add
                # nothing
                .filter(
                    F.col("applied_batch").isNull()
                    | (F.col("applied_batch") < batch_id)
                )
                .select(
                    "event_type",
                    (F.coalesce(F.col("old_n"), F.lit(0)) + F.col("n"))
                    .cast("long")
                    .alias("n"),
                    (
                        F.coalesce(F.col("old_c"), F.lit(0))
                        + F.col("value_cents")
                    )
                    .cast("long")
                    .alias("value_cents"),
                    F.lit(batch_id).cast("long").alias("applied_batch"),
                )
            )
            # no isEmpty probe: merge_snapshot counts the updates frame
            # once anyway and no-ops on zero rows — a probe here would
            # double the join cost per batch
            merge_snapshot(spark, silver_path, updates, ["event_type"])
        finally:
            part.unpersist(blocking=False)

    return _writer


def incremental_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape: build a 3-publish bronze snapshot table from
    deterministic event slices, refresh silver INCREMENTALLY after each
    publish (availableNow drain of the change feed on one shared
    checkpoint — each drain sees exactly the delta versions, proving
    delta-only refresh across restarts), and return the final rollup.
    The result must equal the one-shot batch aggregate over all events,
    which is exactly what the DuckDB oracle computes."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.manifest import (
        append_snapshot,
        read_snapshot,
        snapshot_versions,
    )
    from pandas_to_postgres_spark.sources.parquet import load_table
    from pandas_to_postgres_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )
    from pandas_to_postgres_spark.streaming.sink import stream_to_batch_sink

    spark.dataSource.register(SnapshotDataSource)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    bronze = os.path.join(wh, f"mv_bronze_{tag}")
    silver = os.path.join(wh, f"mv_silver_{tag}")
    ckpt = os.path.join(wh, f"mv_ckpt_{tag}")
    for d in (bronze, silver, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    writer = silver_rollup_writer(silver)
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(bronze)
        published = set()
        for v in snapshot_versions(bronze):
            from pandas_to_postgres_spark.sources.manifest import (
                load_snapshot,
            )

            published.update(
                e["path"] for e in load_snapshot(bronze, v)["files"]
            )
        new = sorted(
            f
            for f in os.listdir(bronze)
            if f.endswith(".parquet")
            and not f.startswith((".", "_"))
            and f not in published
        )
        append_snapshot(bronze, new, stat_cols=["event_id"], spark=spark)
        stream = (
            spark.readStream.format("snapshot").option("path", bronze).load()
        )
        q = stream_to_batch_sink(stream, writer, checkpoint_dir=ckpt)
        if not q.awaitTermination(300):
            # a partially-drained epoch must be an ERROR, never a silent
            # under-application (and starting the next query on a still-
            # active checkpoint would fail anyway)
            q.stop()
            raise TimeoutError(
                "incremental_event_rollup: epoch drain exceeded 300s"
            )

    return read_snapshot(spark, silver).select("event_type", "n", "value_cents")


def refresh_join_mv(
    spark: SparkSession,
    silver_path: str,
    left_path: str,
    right_path: str,
    join_key: str,
    group_col: str,
    agg_col: str,
) -> dict:
    """Incrementally maintain a JOIN materialized view over TWO snapshot
    tables — the classical counting/delta-rule IVM (Gupta–Mumick) on the
    manifest log, for append-only bronzes:

        ΔJ = ΔL ⋈ R_head  ∪  L_prev ⋈ ΔR

    (ΔL⋈ΔR rides the first term because R_head already contains ΔR —
    each delta pair is produced exactly once.) The silver table stores
    per-``group_col`` partials (row count + integer-cents sum of
    ``agg_col``); a refresh

    1. reads the applied (left, right) versions STAMPED IN the silver
       manifest (no side ledger — the stamp travels with the version the
       silver publish creates, so crash-and-rerun re-derives the same
       delta and publishes idempotently);
    2. computes ΔL / ΔR as the FILE DIFF between the stamped and head
       versions of each bronze (append-only ⇒ new rows live exactly in
       the added files — the change-feed rule the streaming reader uses,
       here as a batch read that scans ONLY the delta files);
    3. aggregates the two delta joins (map-side partials; the smaller
       delta side broadcasts);
    4. folds them into the silver partials and publishes ONE new silver
       version whose ``extra`` records the new applied versions.

    Refresh cost tracks |ΔL| + |ΔR| × join width — never a
    re-aggregation of either bronze; at 100 TB this is the difference
    between a nightly full rebuild and a minutes-long catch-up. A no-op
    refresh (no new bronze versions) publishes nothing. Updates/deletes
    would arrive as retraction rows through the CDC change feed
    (``option("ignoreChanges")`` semantics); this operator handles the
    append-only case, matching the snapshot stream reader's default
    contract. Returns the silver head manifest."""
    import os

    from pandas_to_postgres_spark.sources.manifest import (
        load_snapshot,
        publish_snapshot,
        read_snapshot,
        snapshot_versions,
    )

    def head_version(p: str) -> int:
        if not os.path.isdir(p):
            return 0  # bronze not created yet: nothing published
        vs = snapshot_versions(p)
        return vs[-1] if vs else 0

    def delta_df(p: str, v_from: int, v_to: int) -> DataFrame | None:
        """Rows added between versions — a per-VERSION walk, the
        SnapshotStreamReader rule, not an endpoint file diff: a
        ``compact_snapshot`` between refreshes publishes
        ``data_change: false`` versions whose files are rewrites of
        already-applied rows (an endpoint diff would double-count the
        whole table into the MV), and a version that REMOVED files or
        stamped a DV DELETE breaks the append-only delta rule and must
        fail loudly rather than corrupt the view."""
        if v_to <= v_from:
            return None
        emit: set = set()
        prev = (
            {e["path"] for e in load_snapshot(p, v_from)["files"]}
            if v_from
            else set()
        )
        for v in range(v_from + 1, v_to + 1):
            try:
                snap = load_snapshot(p, v)
            except ValueError:
                continue  # expired version: diff folds into the next one
            cur = {e["path"] for e in snap["files"]}
            if snap.get("data_change") is False:
                prev = cur  # compaction: rows only reorganized
                continue
            if snap.get("dml") == "delete_dv":
                raise ValueError(
                    f"refresh_join_mv: version {v} of {p} is a "
                    "deletion-vector DELETE — an append-only delta "
                    "refresh cannot express it; rebuild the view or "
                    "feed it retractions through the CDC path"
                )
            if prev - cur:
                raise ValueError(
                    f"refresh_join_mv: version {v} of {p} REMOVED files "
                    "(merge/delete/overwrite, not an append) — the "
                    "delta rule only holds for append-only bronzes"
                )
            emit.update(cur - prev)
            prev = cur
        added = sorted(emit)
        if not added:
            return None
        return spark.read.parquet(*[os.path.join(p, f) for f in added])

    def partials(j: DataFrame) -> DataFrame:
        return j.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.floor(F.col(agg_col) * 100 + F.lit(0.5)).cast("long")
            ).cast("long").alias("cents"),
        )

    os.makedirs(silver_path, exist_ok=True)
    sv = snapshot_versions(silver_path)
    if sv:
        head = load_snapshot(silver_path)
        applied = head.get("applied_versions", {"left": 0, "right": 0})
        old_partials = read_snapshot(spark, silver_path)
    else:
        applied = {"left": 0, "right": 0}
        old_partials = None

    lv, rv = head_version(left_path), head_version(right_path)
    d_left = delta_df(left_path, applied["left"], lv)
    d_right = delta_df(right_path, applied["right"], rv)
    if d_left is None and d_right is None:
        if not sv:
            # neither bronze has published yet AND no silver exists:
            # the documented no-op publishes nothing — loading an
            # empty silver dir would raise, so report version 0
            return {"version": 0, "applied_versions": dict(applied)}
        return load_snapshot(silver_path)  # nothing to apply: no-op

    deltas = []
    if d_left is not None and rv:
        # pin the captured head version: a publish racing this refresh
        # must not skew the delta join against a newer right side than
        # `rv` stamps (rv == 0: right table unpublished, nothing joins)
        r_head = read_snapshot(spark, right_path, version=rv)
        deltas.append(partials(d_left.join(F.broadcast(r_head), join_key)))
    if d_right is not None and applied["left"]:
        l_prev = read_snapshot(spark, left_path, version=applied["left"])
        deltas.append(
            partials(l_prev.join(F.broadcast(d_right), join_key))
        )
    if not deltas:
        # one bronze grew but nothing can join yet (e.g. right rows with
        # no applied left, or left rows with no right table): publish a
        # metadata-only no-op that ADVANCES the applied stamps, so the
        # next refresh does not rejoin these deltas against future rows
        # twice
        if old_partials is None:
            # nothing ever materialized: just record the watermark by
            # publishing nothing — first real refresh starts from v0 and
            # walks every version, producing each delta pair exactly once
            return {
                "applied_versions": dict(applied),
                "version": 0,
                "noop": True,
            }
        from pandas_to_postgres_spark.sources.manifest import (
            _claim_version,
            _inherit,
            _pack_manifest,
            _strip_entry,
        )

        head = load_snapshot(silver_path)
        nxt = _inherit(
            _pack_manifest(
                silver_path,
                head["version"] + 1,
                head.get("stat_cols", []),
                head["files"],
                head,
            ),
            head,
        )
        nxt["data_change"] = False  # rows untouched: stamp-only advance
        nxt["applied_versions"] = {"left": lv, "right": rv}
        if _claim_version(silver_path, head["version"] + 1, nxt):
            nxt["files"] = [_strip_entry(e) for e in head["files"]]
            return nxt
        return load_snapshot(silver_path)

    allp = deltas[0]
    for d in deltas[1:]:
        allp = allp.unionByName(d)
    if old_partials is not None:
        allp = allp.unionByName(old_partials.select(group_col, "n", "cents"))
    merged = allp.groupBy(group_col).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )

    import shutil
    import tempfile
    import uuid

    os.makedirs(silver_path, exist_ok=True)
    job = uuid.uuid4().hex[:8]
    stage = tempfile.mkdtemp(prefix="joinmv-stage-")
    names = []
    try:
        merged.coalesce(1).write.mode("overwrite").parquet(stage)
        parts = sorted(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        for i, f in enumerate(parts):
            name = f"part-j{job}-{i:05d}.parquet"
            shutil.move(os.path.join(stage, f), os.path.join(silver_path, name))
            names.append(name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return publish_snapshot(
        silver_path,
        [group_col],
        files=names,
        extra={"applied_versions": {"left": lv, "right": rv}},
    )
