"""Run `sinks.merge_statement`'s EXACT production SQL against a real
PostgreSQL 15 server — the reference's actual sink target
(events_postgres_sink.sql). The container ships the full postgres
server (initdb/pg_ctl/psql) but no Spark JDBC driver jar, so Spark
itself talks to Derby in tests/test_jdbc_live.py; THIS module proves
the dialect claim ("valid verbatim on PostgreSQL 15+") on the genuine
engine: a throwaway cluster is initdb'd into tmp, started on a unix
socket (no TCP port to collide with), driven via psql, and torn down.

Skips (not fails) when the server binaries are absent, so the suite
stays green on leaner containers.
"""

from __future__ import annotations

import os
import pwd
import shutil
import subprocess
from pathlib import Path

import pytest

from kafka_flink_streaming_pipeline_spark.sinks import merge_statement

_PG_BINDIRS = [Path("/usr/local/bin"), *Path("/usr/lib/postgresql").glob("*/bin")]


def _find(tool: str) -> str | None:
    for d in _PG_BINDIRS:
        p = d / tool
        if p.exists():
            return str(p)
    return shutil.which(tool)


pg_ctl = _find("pg_ctl")
initdb = _find("initdb")
psql = _find("psql")


def _pg_user() -> str | None:
    """Postgres refuses to run as root; use the distro's postgres
    account when we are root (the container's case)."""
    if os.geteuid() != 0:
        return None  # run directly
    try:
        pwd.getpwnam("postgres")
        return "postgres"
    except KeyError:
        return ""  # root with no postgres user: cannot run


_USER = _pg_user()

pytestmark = pytest.mark.skipif(
    not (pg_ctl and initdb and psql) or _USER == "",
    reason="no runnable postgres server in container",
)


def _run(cmd: list[str], capture: bool = True) -> subprocess.CompletedProcess:
    if _USER:
        cmd = ["runuser", "-u", _USER, "--", *cmd]
    # cwd must be traversable by the postgres user (pytest's cwd is not);
    # `pg_ctl start` must NOT capture pipes — the daemon inherits them
    # and the read never hits EOF while the server lives
    kw = (
        dict(capture_output=True)
        if capture
        else dict(stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    )
    return subprocess.run(cmd, text=True, cwd="/", **kw)


@pytest.fixture(scope="module")
def pg():
    # directly under the 1777 /tmp — pytest's tmp factory nests under a
    # 0700 root-owned dir the postgres user cannot traverse
    import tempfile

    root = Path(tempfile.mkdtemp(prefix="pglive_", dir="/tmp"))
    data, sock = root / "data", root / "sock"
    sock.mkdir()
    os.chmod(root, 0o755)
    os.chmod(sock, 0o777)  # psql runs as root; socket dir must admit all
    if _USER:
        shutil.chown(root, user=_USER)
        shutil.chown(sock, user=_USER)
    r = _run([initdb, "-D", str(data), "-U", "tester", "-A", "trust"])
    assert r.returncode == 0, r.stderr
    # unix-socket only: no TCP listener, no port conflicts
    opts = f"-c listen_addresses='' -c unix_socket_directories={sock}"
    log = data / "server.log"
    r = _run(
        [pg_ctl, "-D", str(data), "-o", opts, "-l", str(log), "-w", "start"],
        capture=False,
    )
    assert r.returncode == 0, log.read_text() if log.exists() else "pg_ctl failed"
    yield {"host": str(sock)}
    _run([pg_ctl, "-D", str(data), "-m", "immediate", "stop"], capture=False)
    shutil.rmtree(root, ignore_errors=True)


def _sql(pg_env: dict, sql: str) -> str:
    r = subprocess.run(
        [psql, "-h", pg_env["host"], "-U", "tester", "-d", "postgres",
         "-v", "ON_ERROR_STOP=1", "-At", "-c", sql],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout.strip()


def test_merge_statement_valid_on_postgres15(pg):
    ver = _sql(pg, "SHOW server_version_num")
    assert int(ver) >= 150000  # MERGE landed in 15
    _sql(pg, 'CREATE TABLE state ("k" int, "v" double precision, "ts" int)')
    _sql(pg, 'CREATE TABLE state_stage ("k" int, "v" double precision, "ts" int)')
    _sql(pg, "INSERT INTO state VALUES (1, 10.0, 100), (2, 20.0, 100)")
    _sql(pg, "INSERT INTO state_stage VALUES (2, 22.0, 300), (4, 40.0, 200)")
    stmt = merge_statement("state", "state_stage", ["k", "v", "ts"], ["k"])
    _sql(pg, stmt)  # the exact string jdbc_merge_upsert executes
    got = _sql(pg, 'SELECT "k","v","ts" FROM state ORDER BY "k"')
    assert got.splitlines() == ["1|10|100", "2|22|300", "4|40|200"]
    # idempotent redelivery: same staging content, same result
    _sql(pg, stmt)
    assert _sql(pg, 'SELECT "k","v","ts" FROM state ORDER BY "k"').splitlines() == [
        "1|10|100",
        "2|22|300",
        "4|40|200",
    ]


def test_conditional_merge_rejects_out_of_order(pg):
    """The order-guarded form (what jdbc_merge_upsert emits when
    order_col is set): a LATE batch with an older ord must not regress
    newer state, and the newer-ord path still updates."""
    _sql(pg, 'CREATE TABLE st2 ("k" int, "v" double precision, "ord" bigint)')
    _sql(pg, 'CREATE TABLE st2_stage ("k" int, "v" double precision, "ord" bigint)')
    _sql(pg, "INSERT INTO st2 VALUES (1, 10.0, 500)")
    stmt = merge_statement(
        "st2", "st2_stage", ["k", "v", "ord"], ["k"], 's."ord" > t."ord"'
    )
    _sql(pg, "INSERT INTO st2_stage VALUES (1, 9.0, 400), (2, 20.0, 100)")
    _sql(pg, stmt)  # late duplicate for k=1: must NOT apply; k=2 inserts
    assert _sql(pg, "SELECT * FROM st2 ORDER BY 1").splitlines() == [
        "1|10|500",
        "2|20|100",
    ]
    _sql(pg, "TRUNCATE st2_stage")
    _sql(pg, "INSERT INTO st2_stage VALUES (1, 11.0, 600)")
    _sql(pg, stmt)  # newer ord: applies
    assert _sql(pg, 'SELECT "v" FROM st2 WHERE "k" = 1') == "11"


def test_merge_statement_keys_only_insert_only(pg):
    """No non-key columns -> the statement must omit WHEN MATCHED
    entirely (UPDATE SET of nothing is a syntax error on both
    engines)."""
    _sql(pg, 'CREATE TABLE seen ("k" int)')
    _sql(pg, 'CREATE TABLE seen_stage ("k" int)')
    _sql(pg, "INSERT INTO seen VALUES (1)")
    _sql(pg, "INSERT INTO seen_stage VALUES (1), (2)")
    stmt = merge_statement("seen", "seen_stage", ["k"], ["k"])
    assert "WHEN MATCHED" not in stmt
    _sql(pg, stmt)
    assert _sql(pg, 'SELECT "k" FROM seen ORDER BY "k"').splitlines() == ["1", "2"]
