"""SQLite-backed table catalog + query history.

Schema mirrors the reference (`src/sqlite.rs:8-46`):

- ``catalog(id, table_ref, table_path, table_schema JSON,
  table_comment, type)`` — ``type`` is 'TABLE' or 'TEMP' (path-as-table
  registrations persist as TEMP rows, `src/data_source/context.rs:113-131`).
- ``query_history(id, sql, status, created_at)`` — every DML outcome;
  listing returns the last 30 (`src/controllers.rs:247`).

This is app-level metadata (re-registered per request), deliberately
NOT a Hive metastore — SURVEY.md §1.1.
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
import time


class Catalog:
    def __init__(self, db_path: str | None = None):
        self.db_path = db_path or os.environ.get("EASYDB_DB", os.path.join(os.getcwd(), "easydb.sqlite"))
        self._lock = threading.Lock()
        self._init_db()

    def _conn(self) -> sqlite3.Connection:
        conn = sqlite3.connect(self.db_path)
        conn.row_factory = sqlite3.Row
        return conn

    def _init_db(self) -> None:
        with self._lock, self._conn() as conn:
            conn.execute(
                """CREATE TABLE IF NOT EXISTS catalog (
                       id INTEGER PRIMARY KEY AUTOINCREMENT,
                       table_ref TEXT NOT NULL,
                       table_path TEXT NOT NULL,
                       table_schema TEXT,
                       table_comment TEXT,
                       type TEXT NOT NULL DEFAULT 'TABLE',
                       created_at TEXT DEFAULT (datetime('now'))
                   )"""
            )
            conn.execute(
                """CREATE TABLE IF NOT EXISTS query_history (
                       id INTEGER PRIMARY KEY AUTOINCREMENT,
                       sql TEXT NOT NULL,
                       status TEXT NOT NULL,
                       created_at TEXT DEFAULT (datetime('now'))
                   )"""
            )

    # ---- catalog (A10, A14, A19) ----

    def create_table(
        self,
        table_ref: str,
        table_path: str,
        columns: list[dict] | None = None,
        comment: str | None = None,
        type_: str = "TABLE",
    ) -> None:
        with self._lock, self._conn() as conn:
            conn.execute(
                "INSERT INTO catalog (table_ref, table_path, table_schema, table_comment, type) "
                "VALUES (?, ?, ?, ?, ?)",
                (table_ref, table_path, json.dumps(columns or []), comment, type_),
            )

    def lookup(self, names: list[str]) -> dict[str, str]:
        """Resolve table names → paths; silently ignores misses
        (CTE names etc., `src/data_source/context.rs:133-154`).
        Latest registration wins for duplicate refs."""
        if not names:
            return {}
        out: dict[str, str] = {}
        with self._lock, self._conn() as conn:
            # chunked: SQLite's default bound-variable limit is 999, and
            # a very wide FROM list would otherwise exceed it
            for i in range(0, len(names), 500):
                chunk = names[i : i + 500]
                ph = ",".join("?" for _ in chunk)
                # BUCKETED rows are listing-only: they must resolve via
                # the Spark metastore (where the bucket spec lives) — a
                # path re-registration here would shadow the table with
                # a plain temp view and silently lose bucketing
                rows = conn.execute(
                    f"SELECT table_ref, table_path FROM catalog "
                    f"WHERE table_ref IN ({ph}) AND type != 'BUCKETED' ORDER BY id",
                    chunk,
                ).fetchall()
                out.update({r["table_ref"]: r["table_path"] for r in rows})
        return out

    def list_tables(self) -> list[dict]:
        """All non-TEMP rows (`src/controllers.rs:149-179`)."""
        with self._lock, self._conn() as conn:
            rows = conn.execute(
                "SELECT id, table_ref, table_path, table_schema, table_comment FROM catalog "
                "WHERE type != 'TEMP' ORDER BY id"
            ).fetchall()
        return [
            {
                "id": r["id"],
                "table_ref": r["table_ref"],
                "table_path": r["table_path"],
                "table_schema": json.loads(r["table_schema"] or "[]"),
                "table_comment": r["table_comment"],
            }
            for r in rows
        ]

    def gc_temp(self, older_than_s: float = 86400.0) -> int:
        """Drop stale TEMP rows (superset: the reference accumulates
        them forever — SURVEY.md §7.4 quirk 4)."""
        cutoff = time.time() - older_than_s
        with self._lock, self._conn() as conn:
            # CAST both sides to INTEGER: strftime returns TEXT, and a
            # TEXT `<` against a string param compares lexicographically
            cur = conn.execute(
                "DELETE FROM catalog WHERE type = 'TEMP' AND "
                "CAST(strftime('%s', created_at) AS INTEGER) < ?",
                (int(cutoff),),
            )
            return cur.rowcount

    # ---- history (A20) ----

    def record_query(self, sql: str, status: str) -> None:
        with self._lock, self._conn() as conn:
            conn.execute("INSERT INTO query_history (sql, status) VALUES (?, ?)", (sql, status))

    def history(self, limit: int = 30) -> list[dict]:
        with self._lock, self._conn() as conn:
            rows = conn.execute(
                "SELECT id, sql, status, created_at FROM query_history ORDER BY id DESC LIMIT ?",
                (limit,),
            ).fetchall()
        return [dict(r) for r in rows]
