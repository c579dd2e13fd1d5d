"""Spark 4 Python DataSource: read FROM PostgreSQL over the pure-Python
wire client — `spark.read.format("pgwire")`.

The reference only loads INTO Postgres; this closes the loop so a loaded
table can be read back, verified, or joined as a Spark source without a
JDBC driver (none ships in this container — the same gap `sinks/pgwire.py`
fills on the write side).

Scale shape:

- **Partitioned reads**: with ``partitionColumn`` + ``numPartitions``,
  partition i issues ``WHERE mod(abs(<col>), N) = i`` — N executors each
  pull a disjoint slice over their own connection, the same
  one-connection-per-task discipline as the COPY sink. NULL keys ride
  partition 0.
- **Filter pushdown** (`pushFilters`, Spark 4.1): opt in with
  ``option("pushdown", "true")`` on a session where
  ``spark.sql.python.filterPushdown.enabled=true`` (the option exists
  because ``reader()`` runs in Spark's session-less planning worker and
  cannot read the conf). EqualTo on any type and inequalities on
  NON-string values compile into the WHERE clause so the SERVER prunes
  rows before they cross the wire; string inequalities stay Spark-side
  (server collation vs binary ordering), as does everything else the API
  hands back.
- Schema comes from ``information_schema.columns`` at plan time; pgwire
  returns text, and each column is converted by declared type in the
  reader (BIGINT/INT → int, DOUBLE/REAL → float, BOOLEAN → 't'/'f',
  DATE/TIMESTAMP → datetime, NUMERIC → Decimal).

- **Streaming reads** (``spark.readStream.format("pgwire")``): polling
  CDC over an append-only table with a monotonic BIGINT
  ``option("seqColumn", ...)`` — offsets are high-water marks in
  Spark's checkpoint, each micro-batch's (lo, hi] interval fans out as
  ``streamPartitions`` modulo-slices, one executor connection each
  (see PostgresStreamReader).

Usage::

    spark.dataSource.register(PostgresDataSource)
    df = (spark.read.format("pgwire")
          .option("host", sockdir).option("port", 5432)
          .option("user", "spark").option("dbname", "spark")
          .option("table", "lineitem")
          .option("partitionColumn", "l_orderkey")
          .option("numPartitions", "8")
          .load())
"""

from __future__ import annotations

import datetime
from decimal import Decimal
from typing import Iterator, List

from dataclasses import dataclass
from typing import Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamArrowWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

#: information_schema data_type → (Spark DDL type, python converter)
_PG_TYPES = {
    "bigint": ("bigint", int),
    "integer": ("int", int),
    "smallint": ("smallint", int),
    "double precision": ("double", float),
    "real": ("float", float),
    "numeric": ("decimal(38,18)", Decimal),
    "text": ("string", str),
    "character varying": ("string", str),
    "character": ("string", str),
    "boolean": ("boolean", lambda v: v == "t"),
    "date": ("date", datetime.date.fromisoformat),
    "timestamp without time zone": (
        "timestamp_ntz",
        datetime.datetime.fromisoformat,
    ),
}


def _connect(options):
    from pandas_to_postgres_spark.sinks import pgwire  # noqa: PLC0415

    kwargs = {"user": options.get("user", "spark"), "dbname": options.get("dbname", "spark")}
    if options.get("host"):
        kwargs["host"] = options["host"]
    if options.get("port"):
        kwargs["port"] = int(options["port"])
    return pgwire.connect(**kwargs)


def _sql_literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"'{v.isoformat()}'"
    return str(v)


class PostgresReaderNoPushdown(DataSourceReader):
    """Partitioned reader WITHOUT pushFilters: merely DEFINING pushFilters
    makes Spark raise [DATA_SOURCE_PUSHDOWN_DISABLED] at plan time when
    ``spark.sql.python.filterPushdown.enabled`` is false (the default) —
    so readers built without ``option("pushdown", "true")`` use this class
    and evaluate filters Spark-side."""

    def __init__(self, options, columns, converters):
        self.options = dict(options)
        self.columns = columns
        self.converters = converters
        self.pushed: List[str] = []

    def partitions(self):
        n = int(self.options.get("numpartitions", "1"))
        return [InputPartition(i) for i in range(max(1, n))]

    def _where(self, pid: int) -> str:
        preds = list(self.pushed)
        n = int(self.options.get("numpartitions", "1"))
        pcol = self.options.get("partitioncolumn")
        if n > 1 and pcol:
            part = f'mod(abs("{pcol}"), {n}) = {pid}'
            if pid == 0:  # NULL keys ride partition 0
                part = f'({part} OR "{pcol}" IS NULL)'
            preds.append(part)
        return (" WHERE " + " AND ".join(preds)) if preds else ""

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        schema = self.options.get("schema", "public")
        table = self.options["table"]
        cols = ", ".join(f'"{c}"' for c in self.columns)
        sql = (
            f'SELECT {cols} FROM "{schema}"."{table}"'
            + self._where(partition.value)
        )
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:
                cur.execute(sql)
                convs = self.converters
                for row in cur.fetchall():
                    yield tuple(
                        None if v is None else conv(v)
                        for v, conv in zip(row, convs)
                    )
        finally:
            conn.close()


class PostgresReader(PostgresReaderNoPushdown):
    _OPS = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }

    def pushFilters(self, filters):  # noqa: N802 - API name
        import pyspark.sql.datasource as _ds  # noqa: PLC0415

        null_ops = {
            getattr(_ds, "IsNull", ()): "IS NULL",
            getattr(_ds, "IsNotNull", ()): "IS NOT NULL",
        }
        for f in filters:
            if type(f) in null_ops and len(f.attribute) == 1:
                self.pushed.append(f'"{f.attribute[0]}" {null_ops[type(f)]}')
                continue
            op = self._OPS.get(type(f))
            # only plain top-level columns ride the WHERE clause — and
            # inequality only on NON-string values: string ordering on the
            # server follows the database collation (often linguistic,
            # e.g. en_US.UTF-8) while Spark compares binary codepoints, so
            # a pushed "name > 'a'" could return rows Spark would exclude.
            # Equality is collation-safe under Postgres's default
            # deterministic collations.
            if (
                op is not None
                and len(f.attribute) == 1
                and (op == "=" or not isinstance(f.value, str))
            ):
                col = f.attribute[0]
                self.pushed.append(f'"{col}" {op} {_sql_literal(f.value)}')
            else:
                yield f


class PostgresDataSource(DataSource):
    """``spark.read.format("pgwire")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "pgwire"

    def _columns(self):
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:
                cur.execute(
                    "SELECT column_name, data_type FROM information_schema.columns"
                    " WHERE table_schema = %s AND table_name = %s"
                    " ORDER BY ordinal_position",
                    (self.options.get("schema", "public"), self.options["table"]),
                )
                rows = cur.fetchall()
        finally:
            conn.close()
        if not rows:
            raise ValueError(f"table {self.options['table']!r} does not exist")
        cols, ddl, convs = [], [], []
        for name, dtype in rows:
            spark_t, conv = _PG_TYPES.get(dtype, ("string", str))
            cols.append(name)
            ddl.append(f"{name} {spark_t}")
            convs.append(conv)
        return cols, ", ".join(ddl), convs

    def schema(self) -> str:
        self._cols, ddl, self._convs = self._columns()
        return ddl

    def writer(self, schema, overwrite: bool):
        """``df.write.format("pgwire").mode("append"|"overwrite")`` —
        staged, atomic, retry-safe write path (see PostgresArrowWriter)."""
        return PostgresArrowWriter(
            self.options, [f.name for f in schema.fields], overwrite
        )

    def streamWriter(self, schema, overwrite: bool):
        """``df.writeStream.format("pgwire")`` — exactly-once staged
        append per epoch (see PostgresStreamWriter). Append-only."""
        if overwrite:
            raise ValueError(
                "pgwire streaming sink is append-only; use foreachBatch"
                " + staged_full_refresh for replace semantics"
            )
        return PostgresStreamWriter(
            self.options, [f.name for f in schema.fields]
        )

    def streamReader(self, schema):
        """``spark.readStream.format("pgwire")`` — incremental CDC-style
        reads over a MONOTONIC sequence column (see PostgresStreamReader).
        Requires ``option("seqColumn", ...)``."""
        all_cols, _, all_convs = self._columns()
        cols, convs = [], []
        for name in schema.fieldNames():
            idx = all_cols.index(name)
            cols.append(name)
            convs.append(all_convs[idx])
        return PostgresStreamReader(self.options, cols, convs)

    def reader(self, schema) -> PostgresReaderNoPushdown:
        all_cols, _, all_convs = self._columns()
        # honor a user-supplied .schema(...): Spark skips calling schema()
        # and hands the user's StructType here — project and convert ONLY
        # those fields (in the user's order), instead of yielding
        # full-width tuples against a narrower expected schema
        conv_by_name = dict(zip(all_cols, all_convs))
        cols, convs = [], []
        for name in schema.fieldNames():
            if name not in conv_by_name:
                raise ValueError(
                    f"column {name!r} not in table "
                    f"{self.options['table']!r} ({all_cols})"
                )
            cols.append(name)
            convs.append(conv_by_name[name])
        # reader() runs in Spark's spawned planning worker, which has NO
        # SparkSession/SparkContext — the conf is unreadable here, so the
        # pushdown-capable reader is opted into via option("pushdown",
        # "true") (requires spark.sql.python.filterPushdown.enabled=true
        # on the session, else Spark raises DATA_SOURCE_PUSHDOWN_DISABLED
        # at plan time). A getActiveSession()-based probe would silently
        # always pick the no-pushdown reader.
        enabled = str(self.options.get("pushdown", "false")).lower() == "true"
        cls = PostgresReader if enabled else PostgresReaderNoPushdown
        return cls(self.options, cols, convs)


@dataclass
class PgWriteCommit(WriterCommitMessage):
    """Per-task commit message: which stage table holds the partition."""

    stage: Optional[str]
    n_rows: int


class PostgresArrowWriter(DataSourceArrowWriter):
    """``df.write.format("pgwire")`` — the WRITE half of the Python
    DataSource, mapping Spark's writer commit protocol onto the staged
    COPY pattern (`sinks/postgres_copy.staged_full_refresh`):

    - ``write`` (per task): CREATE a task-private stage table + COPY the
      partition's Arrow batches into it, both in ONE transaction; the
      stage name is attempt-unique, so a retried or speculative attempt
      can never double-write, and its name is the commit message.
    - ``commit`` (driver, all tasks succeeded): ONE transaction —
      TRUNCATE on overwrite mode, INSERT every message's stage, drop
      stages. Readers see the old table until the commit.
    - ``abort`` (driver, any task failed): drop the stages.

    Stage names carry a per-JOB uuid prefix (minted driver-side in
    ``__init__`` and shipped to tasks inside the pickled writer), so the
    commit/abort sweep only ever sees ITS OWN job's stages — a
    concurrent writer to the same table can neither have staged data
    dropped out from under it nor drop ours. The commit transaction
    additionally takes ``pg_advisory_xact_lock(hashtext(schema.table))``
    so two simultaneous publishes serialize instead of deadlocking on
    TRUNCATE + INSERT ordering. Residual caveat: a stage created by a
    zombie/speculative task AFTER its job's sweep, or by a job whose
    driver died before commit/abort, is an orphan — bounded cleanup is
    ``DROP TABLE`` of ``<table>__dsw_%`` at a quiet moment.

    Scale: identical data plane to `parallel_copy` (one connection per
    task, pyarrow C++ CSV serialization, memory bounded by the Arrow
    batch size); the commit transaction is server-side set operations.
    """

    def __init__(self, options, columns, overwrite: bool):
        import uuid  # noqa: PLC0415

        self.options = dict(options)
        self.columns = list(columns)
        self.overwrite = overwrite
        self.schema_name = options.get("schema", "public")
        self.table = options["table"]
        # job-scoped stage namespace: minted once on the driver, pickled
        # into every task — concurrent writers never see each other's stages
        self.job_id = uuid.uuid4().hex[:8]

    def _q(self, name: str) -> str:
        return f'"{self.schema_name}"."{name}"'

    def write(self, iterator) -> PgWriteCommit:
        import itertools  # noqa: PLC0415
        import uuid  # noqa: PLC0415

        from pandas_to_postgres_spark.sinks.postgres_copy import (  # noqa: PLC0415
            _ArrowCsvStream,
        )

        first = next(iterator, None)
        if first is None:
            return PgWriteCommit(stage=None, n_rows=0)
        stage = f"{self.table}__dsw_{self.job_id}_{uuid.uuid4().hex[:12]}"
        col_list = ", ".join(f'"{c}"' for c in self.columns)
        stream = _ArrowCsvStream(itertools.chain([first], iterator))
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:
                cur.execute(
                    f"CREATE TABLE {self._q(stage)} "
                    f"(LIKE {self._q(self.table)} INCLUDING DEFAULTS)"
                )
                cur.copy_expert(
                    f"COPY {self._q(stage)} ({col_list}) FROM STDIN WITH CSV",
                    stream,
                )
        finally:
            conn.close()
        return PgWriteCommit(stage=stage, n_rows=stream.rows)

    def _all_stages(self, cur) -> list:
        import re  # noqa: PLC0415

        prefix = f"{self.table}__dsw_{self.job_id}_"
        cur.execute(
            "SELECT tablename FROM pg_tables"
            " WHERE schemaname = %s AND tablename LIKE %s",
            (self.schema_name, prefix.replace("_", r"\_") + "%"),
        )
        pat = re.compile(re.escape(prefix) + r"[0-9a-f]+$")
        return sorted(r[0] for r in cur.fetchall() if pat.fullmatch(r[0]))

    def commit(self, messages) -> None:
        col_list = ", ".join(f'"{c}"' for c in self.columns)
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:  # ONE txn: atomic publish
                # serialize concurrent publishes to the same target
                # (released automatically at txn end)
                cur.execute(
                    "SELECT pg_advisory_xact_lock(hashtext(%s))",
                    (f"{self.schema_name}.{self.table}",),
                )
                if self.overwrite:
                    cur.execute(f"TRUNCATE {self._q(self.table)}")
                for m in messages:
                    if m is not None and m.stage:
                        cur.execute(
                            f"INSERT INTO {self._q(self.table)} ({col_list})"
                            f" SELECT {col_list} FROM {self._q(m.stage)}"
                        )
                for st in self._all_stages(cur):
                    cur.execute(f"DROP TABLE {self._q(st)}")
        finally:
            conn.close()

    def abort(self, messages) -> None:
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:
                for st in self._all_stages(cur):
                    cur.execute(f"DROP TABLE {self._q(st)}")
        finally:
            conn.close()


@dataclass
class PgStreamPartition(InputPartition):
    """One micro-batch slice: rows with ``lo < seq <= hi`` and
    ``mod(abs(seq), n_slices) = slice`` — contiguous in offset space,
    sliced for executor parallelism within the batch."""

    lo: int
    hi: int
    slice: int
    n_slices: int


class PostgresStreamReader(DataSourceStreamReader):
    """Spark 4 streaming Python DataSource reader: incremental reads from
    an APPEND-ONLY Postgres table ordered by a monotonic BIGINT sequence
    column (``option("seqColumn", ...)``) — the polling-CDC ingest shape
    (outbox tables, audit logs, ledger feeds).

    Offsets are ``{"seq": N}`` = "everything with seq <= N has been
    emitted". ``latestOffset`` polls ``max(seq)`` on the driver;
    ``partitions(start, end)`` fans the (start, end] interval out as
    ``streamPartitions`` modulo-slices so each EXECUTOR pulls its share
    over its own connection (same discipline as the batch reader);
    ``read`` runs the per-slice SELECT. Exactly-once downstream comes
    from Spark's offset log + the sink's idempotency, exactly like a
    file source: a replayed batch re-issues the same (lo, hi] queries,
    and an append-only feed returns the same rows.

    Contract: ``seqColumn`` values must never decrease once visible (an
    outbox with a sequence/identity column). Rows that commit OUT of
    seq order can be missed if a poll observes a later seq first —
    the standard polling-CDC caveat; use a single-writer outbox or an
    insert trigger to guarantee visibility order.
    """

    def __init__(self, options, columns, converters):
        self.options = dict(options)
        self.columns = list(columns)
        self.converters = list(converters)
        self.table = options["table"]
        self.schema_name = options.get("schema", "public")
        self.seq_col = options["seqColumn"]
        self.n_slices = int(options.get("streamPartitions", "2"))
        self.start_seq = int(options.get("startSeq", "-1"))

    def _q(self) -> str:
        return f'"{self.schema_name}"."{self.table}"'

    def initialOffset(self) -> dict:
        return {"seq": self.start_seq}

    def latestOffset(self) -> dict:
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:
                cur.execute(
                    f'SELECT coalesce(max("{self.seq_col}"), %s) FROM {self._q()}',
                    (self.start_seq,),
                )
                (mx,) = cur.fetchall()[0]
        finally:
            conn.close()
        return {"seq": int(mx)}

    def partitions(self, start: dict, end: dict):
        if int(end["seq"]) <= int(start["seq"]):
            return []
        return [
            PgStreamPartition(
                lo=int(start["seq"]),
                hi=int(end["seq"]),
                slice=i,
                n_slices=self.n_slices,
            )
            for i in range(self.n_slices)
        ]

    def read(self, part: PgStreamPartition) -> Iterator[tuple]:
        col_list = ", ".join(f'"{c}"' for c in self.columns)
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:
                cur.execute(
                    f"SELECT {col_list} FROM {self._q()}"
                    f' WHERE "{self.seq_col}" > %s AND "{self.seq_col}" <= %s'
                    f' AND mod(abs("{self.seq_col}"), %s) = %s',
                    (part.lo, part.hi, part.n_slices, part.slice),
                )
                for row in cur.fetchall():
                    yield tuple(
                        None if v is None else conv(v)
                        for v, conv in zip(row, self.converters)
                    )
        finally:
            conn.close()

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; the source is passive


class PostgresStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("pgwire")`` — exactly-once streaming
    append into Postgres through the writer-commit protocol:

    - ``write`` (per task): stage the partition's Arrow batches into a
      task-private table (one transaction), exactly like the batch
      writer — retried/speculative attempts can never double-write.
    - ``commit`` (per epoch; runs in Spark's separate commit-runner
      process, so NO writer state survives from the task side — stages
      are addressed ONLY through the commit messages): ONE transaction
      takes the advisory lock, consults the epoch LEDGER (same
      convention as `sinks/postgres_copy.load_batch_exactly_once`) — if
      this (table, run, batchId) already committed, the replay only
      drops its message stages; otherwise it publishes every message
      stage, records the epoch, and drops them.

    The ledger is namespaced by ``option("runId", ...)`` — a stable
    per-query identity the caller derives from the CHECKPOINT location
    (restarts of the same checkpoint must pass the same runId so epoch
    replays are recognized; a NEW query with a fresh checkpoint must
    pass a new runId so its batchIds 0,1,2... don't collide with a
    previous run's ledger rows and silently drop every epoch). When
    runId is omitted it defaults to '' with a warning: safe for the
    first query against a table, unsafe for the second — clear
    ``stream_epochs`` or pass runId.
    - ``abort``: drops the failed epoch's message stages. A stage whose
      task died before messaging is an orphan (same caveat as the batch
      writer): bounded cleanup is DROP of ``<table>__dsws_%`` at a
      quiet moment.

    Append-only by design (a streaming sink that TRUNCATEs per epoch
    would destroy history); use foreachBatch + `staged_full_refresh`
    for replace semantics.
    """

    def __init__(self, options, columns):
        import uuid  # noqa: PLC0415
        import warnings  # noqa: PLC0415

        self.options = dict(options)
        self.columns = list(columns)
        self.schema_name = options.get("schema", "public")
        self.table = options["table"]
        self.epoch_table = options.get("epochTable", "stream_epochs")
        self.run_id = options.get("runId", "")
        if not self.run_id:
            warnings.warn(
                "pgwire streaming sink: no runId option — the epoch "
                "ledger is shared across queries, so starting a NEW "
                "query (fresh checkpoint) against a previously-written "
                "table would match the old run's batchIds and silently "
                "drop every epoch. Pass option('runId', <id derived "
                "from the checkpoint location>).",
                stacklevel=2,
            )
        # query_id scopes STAGE table names per writer instance only
        # (never the ledger — a driver restart mints a new one)
        self.query_id = uuid.uuid4().hex[:8]

    def _q(self, name: str) -> str:
        return f'"{self.schema_name}"."{name}"'

    def write(self, iterator) -> PgWriteCommit:
        import itertools  # noqa: PLC0415
        import uuid  # noqa: PLC0415

        from pandas_to_postgres_spark.sinks.postgres_copy import (  # noqa: PLC0415
            _ArrowCsvStream,
        )

        first = next(iterator, None)
        if first is None:
            return PgWriteCommit(stage=None, n_rows=0)
        stage = f"{self.table}__dsws_{self.query_id}_{uuid.uuid4().hex[:12]}"
        col_list = ", ".join(f'"{c}"' for c in self.columns)
        stream = _ArrowCsvStream(itertools.chain([first], iterator))
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:
                cur.execute(
                    f"CREATE TABLE {self._q(stage)} "
                    f"(LIKE {self._q(self.table)} INCLUDING DEFAULTS)"
                )
                cur.copy_expert(
                    f"COPY {self._q(stage)} ({col_list}) FROM STDIN WITH CSV",
                    stream,
                )
        finally:
            conn.close()
        return PgWriteCommit(stage=stage, n_rows=stream.rows)

    @staticmethod
    def _stages(messages) -> list:
        return sorted(
            {m.stage for m in messages if m is not None and m.stage}
        )

    def commit(self, messages, batchId) -> None:  # noqa: N803 — API name
        ledger = self._q(self.epoch_table)
        col_list = ", ".join(f'"{c}"' for c in self.columns)
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:
                # create-or-migrate: adds run_id AND moves the PK to
                # (table_name, run_id, batch_id) — a legacy 2-column PK
                # would reject every new run's batch 0 (ADVICE r6)
                from pandas_to_postgres_spark.sinks.postgres_copy import (
                    _ensure_ledger,
                )

                _ensure_ledger(cur, ledger)
            try:
                with conn, conn.cursor() as cur:  # ONE publish txn
                    cur.execute(
                        "SELECT pg_advisory_xact_lock(hashtext(%s))",
                        (f"{self.schema_name}.{self.table}",),
                    )
                    cur.execute(
                        f"SELECT 1 FROM {ledger}"
                        " WHERE table_name = %s AND run_id = %s"
                        " AND batch_id = %s",
                        (self.table, self.run_id, int(batchId)),
                    )
                    replay = bool(cur.fetchall())
                    n = 0
                    if not replay:
                        for m in messages:
                            if m is not None and m.stage:
                                cur.execute(
                                    f"INSERT INTO {self._q(self.table)}"
                                    f" ({col_list}) SELECT {col_list}"
                                    f" FROM {self._q(m.stage)}"
                                )
                                n += m.n_rows
                        cur.execute(
                            f"INSERT INTO {ledger}"
                            " (table_name, run_id, batch_id, n_rows)"
                            " VALUES (%s, %s, %s, %s)",
                            (self.table, self.run_id, int(batchId), n),
                        )
                    for st in self._stages(messages):
                        cur.execute(f"DROP TABLE IF EXISTS {self._q(st)}")
            except Exception as e:
                from pandas_to_postgres_spark.sinks.postgres_copy import (
                    _is_unique_violation,
                )

                if not _is_unique_violation(e):
                    raise
                # the ledger row already exists (a publisher outside the
                # advisory lock, e.g. an unmigratable legacy row): the txn
                # rolled back whole — treat as a replay instead of
                # crash-looping; drop this attempt's orphaned stages
                cln = _connect(self.options)
                cln.autocommit = True
                try:
                    with cln.cursor() as cur:
                        for st in self._stages(messages):
                            cur.execute(
                                f"DROP TABLE IF EXISTS {self._q(st)}"
                            )
                finally:
                    cln.close()
        finally:
            conn.close()

    def abort(self, messages, batchId) -> None:  # noqa: N803 — API name
        conn = _connect(self.options)
        try:
            with conn, conn.cursor() as cur:
                for st in self._stages(messages):
                    cur.execute(f"DROP TABLE IF EXISTS {self._q(st)}")
        finally:
            conn.close()
