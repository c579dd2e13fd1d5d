"""Throwaway local PostgreSQL server management (tests + benchmarks).

The container ships Postgres 15 server binaries with no client library;
`sinks/pgwire.py` supplies the client half. This module supplies the server
half: initdb a fresh cluster into a temp dir, start it on a unix socket
only (no TCP port collisions), hand back psycopg2-style conn params, and
tear it all down. Postgres refuses to run as root, so under root every
server command is wrapped with ``runuser -u nobody``.

Used by tests/test_postgres_integration.py (correctness) and bench.py's
optional real-COPY throughput measurement (the reference's published
197k rows/s is a COPY-into-Postgres number — `/root/reference/README.md:16`
— so the honest comparison loads a real server, not a parquet sink).
"""

from __future__ import annotations

import os
import pathlib
import shutil
import subprocess
import tempfile
import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class LocalPostgres:
    base: pathlib.Path
    data: pathlib.Path
    port: int
    user: str
    conn_params: dict = field(default_factory=dict)


def _runner() -> list[str]:
    """Command prefix that runs Postgres as a non-root user when needed."""
    if os.geteuid() != 0:
        return []
    return ["runuser", "-u", "nobody", "--"]


def available() -> Optional[str]:
    """None if a throwaway server can run here, else the skip reason."""
    if shutil.which("initdb") is None or shutil.which("pg_ctl") is None:
        return "postgres server binaries not installed"
    if os.geteuid() == 0:
        if shutil.which("runuser") is None:
            return "running as root and no runuser available"
        try:
            import pwd

            pwd.getpwnam("nobody")
        except KeyError:
            return "running as root and no 'nobody' user"
    return None


#: production-standard bulk-load server tuning (what a DBA sets on an ETL
#: target before a big load): async commit (bounded-loss, not corruption),
#: load-sized WAL/buffer capacity, autovacuum deferred to post-load
#: ANALYZE. Deliberately NOT fsync=off — that knob fakes benchmark
#: durability a real target wouldn't give up.
BULK_LOAD_OPTS = (
    "-c synchronous_commit=off",
    "-c shared_buffers=1GB",
    "-c max_wal_size=8GB",
    "-c wal_buffers=64MB",
    "-c checkpoint_timeout=30min",
    "-c autovacuum=off",
)


def start(
    port: int = 54329,
    user: str = "spark",
    dbname: str = "spark",
    server_opts: tuple[str, ...] = (),
) -> LocalPostgres:
    """initdb + start a fresh trust-auth cluster on a unix socket.

    The cluster lives in a plain mkdtemp dir (a pytest tmp_path chain is
    0700 root-owned — the 'nobody' server process could not traverse it).
    ``server_opts`` appends extra ``postgres`` options (e.g.
    :data:`BULK_LOAD_OPTS`).
    """
    reason = available()
    if reason:
        raise RuntimeError(reason)
    base = pathlib.Path(tempfile.mkdtemp(prefix="pglocal_"))
    run = _runner()
    if run:
        subprocess.run(["chown", "-R", "nobody:nogroup", str(base)], check=True)
    data = base / "data"
    subprocess.run(
        [*run, "initdb", "-D", str(data), "-A", "trust", "-U", user],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        [
            *run, "pg_ctl", "-D", str(data), "-l", str(base / "log"), "-w",
            "-o", " ".join((f"-k {base} -p {port} -c listen_addresses=''", *server_opts)),
            "start",
        ],
        check=True,
        capture_output=True,
    )
    sock = base / f".s.PGSQL.{port}"
    for _ in range(100):
        if sock.exists():
            break
        time.sleep(0.1)
    lp = LocalPostgres(
        base=base,
        data=data,
        port=port,
        user=user,
        conn_params={"host": str(base), "port": port, "user": user, "dbname": dbname},
    )
    if dbname != "postgres":
        from pandas_to_postgres_spark.sinks import pgwire

        conn = pgwire.connect(**{**lp.conn_params, "dbname": "postgres"})
        conn.autocommit = True
        with conn.cursor() as cur:
            cur.execute(f'CREATE DATABASE "{dbname}"')
        conn.close()
    return lp


def stop(lp: LocalPostgres) -> None:
    subprocess.run(
        [*_runner(), "pg_ctl", "-D", str(lp.data), "-m", "immediate", "stop"],
        check=False,
        capture_output=True,
    )
    shutil.rmtree(lp.base, ignore_errors=True)
