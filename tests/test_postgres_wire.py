"""REAL-POSTGRES wire witness for the JDBC sink's SQL contracts.

Closes (half of) the carried VERDICT gap "a real MySQL/Postgres wire
witness": this sandbox ships PostgreSQL 15 server binaries, so the
``postgres`` dialect of :func:`upsert_publish_sql` /
:func:`upsert_via_staging_sql` / :func:`upsert_row_sql` is executed
against an actual server — not sqlite standing in, not pinned SQL
text. The MySQL arm remains text-pinned (no MySQL/MariaDB server in
the container; the divergence contract is documented at
``upsert_row_sql`` and pinned by test_sinks_streaming).

Mechanics: the container runs as root and postgres refuses root, so
the cluster is initdb'd and started as ``nobody`` via setpriv on a
UNIX socket under a temp dir (no TCP port, no global state, removed on
teardown). Statements go over the wire via psql with ON_ERROR_STOP.
Everything is skipped cleanly where the binaries or the privilege
drop are unavailable.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

from db_loader_spark.sinks.jdbc_sink import (
    upsert_publish_sql,
    upsert_row_sql,
    upsert_via_staging_sql,
)

INITDB = shutil.which("initdb") or "/usr/local/bin/initdb"
PG_CTL = shutil.which("pg_ctl") or "/usr/local/bin/pg_ctl"
PSQL = shutil.which("psql")
SETPRIV = shutil.which("setpriv")

_need = [p for p in (INITDB, PG_CTL, PSQL) if not (p and os.path.exists(p))]
pytestmark = pytest.mark.skipif(
    bool(_need), reason=f"postgres tooling missing: {_need}"
)


def _as_pg_user(cmd: list[str], home: str) -> list[str]:
    """Wrap a server-side command so it does not run as root (postgres
    hard-refuses euid 0). Non-root environments run it directly."""
    if os.geteuid() != 0:
        return cmd
    if not SETPRIV:
        pytest.skip("root without setpriv: cannot drop privileges for postgres")
    return [
        SETPRIV,
        "--reuid=nobody",
        "--regid=nogroup",
        "--clear-groups",
        "env",
        f"HOME={home}",
        *cmd,
    ]


class PG:
    def __init__(self, sockdir: str):
        self.sockdir = sockdir

    def sql(self, script: str, check: bool = True) -> subprocess.CompletedProcess:
        """Run a SQL script over the wire in ONE psql session (so BEGIN/
        COMMIT spans statements), ON_ERROR_STOP, tuples-only output."""
        return subprocess.run(
            [
                PSQL,
                "-h",
                self.sockdir,
                "-U",
                "pg",
                "-d",
                "postgres",
                "-v",
                "ON_ERROR_STOP=1",
                "-At",
                "-f",
                "-",
            ],
            input=script,
            capture_output=True,
            text=True,
            check=check,
            cwd=self.sockdir,
        )

    def rows(self, query: str) -> list[str]:
        return [r for r in self.sql(query).stdout.splitlines() if r]


@pytest.fixture(scope="module")
def pg():
    d = tempfile.mkdtemp(prefix="pg_wire_")
    try:
        if os.geteuid() == 0:
            os.chmod(d, 0o777)
            shutil.chown(d, "nobody", "nogroup")
        data = os.path.join(d, "data")
        r = subprocess.run(
            _as_pg_user(
                [INITDB, "-D", data, "-A", "trust", "-U", "pg", "--no-sync"], d
            ),
            capture_output=True,
            text=True,
            cwd=d,
        )
        if r.returncode != 0:
            pytest.skip(f"initdb failed in this environment: {r.stderr[-300:]}")
        r = subprocess.run(
            _as_pg_user(
                [
                    PG_CTL,
                    "-D",
                    data,
                    "-l",
                    os.path.join(d, "log"),
                    "-w",
                    "-o",
                    f"-c listen_addresses='' -c unix_socket_directories={d}",
                    "start",
                ],
                d,
            ),
            capture_output=True,
            text=True,
            cwd=d,
        )
        if r.returncode != 0:
            pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")
        try:
            yield PG(d)
        finally:
            subprocess.run(
                _as_pg_user([PG_CTL, "-D", data, "-w", "-m", "fast", "stop"], d),
                capture_output=True,
                cwd=d,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(autouse=True)
def _fresh_tables(pg):
    pg.sql("DROP TABLE IF EXISTS tgt; DROP TABLE IF EXISTS stg;")
    yield


def test_staging_publish_upserts_and_clears_staging(pg):
    """K6/T5 on the wire: the generated postgres publish script updates
    collided keys, inserts new ones, and leaves staging empty — one
    transaction."""
    pg.sql(
        "CREATE TABLE tgt (id INT PRIMARY KEY, v TEXT, n INT);"
        "CREATE TABLE stg (id INT, v TEXT, n INT);"
        "INSERT INTO tgt VALUES (1, 'old', 10), (2, 'keep', 20);"
        "INSERT INTO stg VALUES (1, 'new', 11), (3, 'ins', 30);"
    )
    script = upsert_via_staging_sql(
        "tgt", "stg", ["id", "v", "n"], ["id"], dialect="postgres"
    )
    pg.sql(";\n".join(script) + ";")
    assert pg.rows("SELECT id, v, n FROM tgt ORDER BY id") == [
        "1|new|11",
        "2|keep|20",
        "3|ins|30",
    ]
    assert pg.rows("SELECT COUNT(*) FROM stg") == ["0"]


def test_staging_publish_is_idempotent_replay(pg):
    """T5 retry token semantics: replaying the publish after staging
    was cleared is a no-op (empty SELECT feeds the INSERT)."""
    pg.sql(
        "CREATE TABLE tgt (id INT PRIMARY KEY, v TEXT, n INT);"
        "CREATE TABLE stg (id INT, v TEXT, n INT);"
        "INSERT INTO stg VALUES (1, 'a', 1);"
    )
    script = ";\n".join(
        upsert_via_staging_sql("tgt", "stg", ["id", "v", "n"], ["id"], "postgres")
    ) + ";"
    pg.sql(script)
    before = pg.rows("SELECT id, v, n FROM tgt ORDER BY id")
    pg.sql(script)  # replay: staging already drained
    assert pg.rows("SELECT id, v, n FROM tgt ORDER BY id") == before == ["1|a|1"]


def test_staging_publish_rolls_back_atomically(pg):
    """The BEGIN...COMMIT script is transactional on the wire: a
    mid-script failure (NOT NULL violation during the publish insert)
    leaves the target untouched AND staging undrained."""
    pg.sql(
        "CREATE TABLE tgt (id INT PRIMARY KEY, v TEXT NOT NULL);"
        "CREATE TABLE stg (id INT, v TEXT);"
        "INSERT INTO tgt VALUES (1, 'old');"
        "INSERT INTO stg VALUES (2, NULL);"  # violates tgt NOT NULL
    )
    script = ";\n".join(
        upsert_via_staging_sql("tgt", "stg", ["id", "v"], ["id"], "postgres")
    ) + ";"
    r = pg.sql(script, check=False)
    assert r.returncode != 0 and "null value" in r.stderr
    assert pg.rows("SELECT id, v FROM tgt ORDER BY id") == ["1|old"]
    assert pg.rows("SELECT COUNT(*) FROM stg") == ["1"]


def _bind(sql: str, values: tuple) -> str:
    """Substitute JDBC '?' placeholders with SQL literals for the psql
    wire run (the JVM path binds them; the CONTRACT under test is the
    conflict clause, not the binding)."""
    out = sql
    for v in values:
        lit = "NULL" if v is None else (str(v) if isinstance(v, int) else f"'{v}'")
        out = out.replace("?", lit, 1)
    return out


def test_row_upsert_ansi_dialect_on_real_postgres(pg):
    """The K5 retry-idempotence primitive: the same generated statement
    inserts on first run and updates (not duplicates) on replay."""
    pg.sql("CREATE TABLE tgt (id INT PRIMARY KEY, v TEXT);")
    sql = upsert_row_sql("tgt", ["id", "v"], ["id"], dialect="ansi")
    pg.sql(_bind(sql, (7, "first")) + ";")
    pg.sql(_bind(sql, (7, "retry")) + ";")
    assert pg.rows("SELECT id, v FROM tgt") == ["7|retry"]


def test_row_upsert_key_only_degrades_to_do_nothing(pg):
    pg.sql("CREATE TABLE tgt (id INT PRIMARY KEY);")
    sql = upsert_row_sql("tgt", ["id"], ["id"], dialect="ansi")
    assert "DO NOTHING" in sql
    pg.sql(_bind(sql, (3,)) + ";")
    pg.sql(_bind(sql, (3,)) + ";")
    assert pg.rows("SELECT COUNT(*) FROM tgt") == ["1"]


def test_multi_unique_key_divergence_contract_on_postgres(pg):
    """The documented dialect divergence, now wire-witnessed on the
    postgres side: ON CONFLICT (id) targets exactly the id index, so a
    row colliding on a DIFFERENT unique index raises instead of
    updating (MySQL's ON DUPLICATE KEY UPDATE would update — the
    reason the sink's contract demands keys = the table's only unique
    constraint)."""
    pg.sql(
        "CREATE TABLE tgt (id INT PRIMARY KEY, email TEXT UNIQUE, v TEXT);"
        "INSERT INTO tgt VALUES (1, 'a@x', 'row1');"
    )
    sql = upsert_row_sql("tgt", ["id", "email", "v"], ["id"], dialect="ansi")
    r = pg.sql(_bind(sql, (2, "a@x", "row2")) + ";", check=False)
    assert r.returncode != 0 and "tgt_email_key" in r.stderr
    assert pg.rows("SELECT COUNT(*) FROM tgt") == ["1"]
