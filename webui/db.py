"""SQLite model-zoo store — counterpart of the reference webui's db.cjs
(users table with pbkdf2-hashed passwords + per-user salt, models table with
owner/title/date/stars; reference webui/db.cjs:9-37). Stdlib sqlite3 +
hashlib — no ORM, no node runtime.

Connections are opened per call: the server is a ThreadingHTTPServer and
sqlite3 connections are not shareable across threads; per-call connects cost
microseconds against a local file and make every operation its own
transaction.
"""

from __future__ import annotations

import hashlib
import os
import secrets
import sqlite3
import time

# Same pbkdf2 work factor as the reference (db.cjs:32: 310000, 32, sha256).
PBKDF2_ITERS = 310_000
_SCHEMA = """
CREATE TABLE IF NOT EXISTS users (
  id INTEGER PRIMARY KEY,
  username TEXT UNIQUE NOT NULL,
  hashed_password BLOB NOT NULL,
  salt BLOB NOT NULL
);
CREATE TABLE IF NOT EXISTS models (
  id TEXT PRIMARY KEY,
  owner TEXT NOT NULL,
  title TEXT NOT NULL,
  date TEXT NOT NULL,
  stars INTEGER NOT NULL DEFAULT 0,
  path TEXT NOT NULL
);
"""


def _hash(password: str, salt: bytes) -> bytes:
    return hashlib.pbkdf2_hmac("sha256", password.encode(), salt, PBKDF2_ITERS)


class ZooDB:
    """users + models metadata for the gallery/upload routes."""

    def __init__(self, path: str):
        self.path = path
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with self._conn() as c:
            c.executescript(_SCHEMA)

    def _conn(self) -> sqlite3.Connection:
        c = sqlite3.connect(self.path, timeout=10.0)
        c.row_factory = sqlite3.Row
        return c

    # -- users ---------------------------------------------------------------
    def create_user(self, username: str, password: str) -> bool:
        salt = secrets.token_bytes(16)
        try:
            with self._conn() as c:
                c.execute(
                    "INSERT INTO users (username, hashed_password, salt) "
                    "VALUES (?, ?, ?)",
                    (username, _hash(password, salt), salt),
                )
            return True
        except sqlite3.IntegrityError:
            return False

    def verify_user(self, username: str, password: str) -> bool:
        with self._conn() as c:
            row = c.execute(
                "SELECT hashed_password, salt FROM users WHERE username = ?",
                (username,),
            ).fetchone()
        if row is None:
            return False
        return secrets.compare_digest(
            _hash(password, row["salt"]), row["hashed_password"]
        )

    def users(self) -> list[str]:
        with self._conn() as c:
            return [
                r["username"]
                for r in c.execute("SELECT username FROM users ORDER BY id")
            ]

    def has_users(self) -> bool:
        with self._conn() as c:
            return c.execute("SELECT 1 FROM users LIMIT 1").fetchone() is not None

    # -- models ----------------------------------------------------------------
    def add_model(self, mid: str, owner: str, title: str, path: str) -> None:
        with self._conn() as c:
            c.execute(
                "INSERT OR REPLACE INTO models (id, owner, title, date, stars, path) "
                "VALUES (?, ?, ?, ?, COALESCE("
                "  (SELECT stars FROM models WHERE id = ?), 0), ?)",
                (mid, owner, title,
                 time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()), mid, path),
            )

    def get_model(self, mid: str) -> dict | None:
        with self._conn() as c:
            row = c.execute("SELECT * FROM models WHERE id = ?", (mid,)).fetchone()
        return dict(row) if row else None

    def delete_model(self, mid: str) -> None:
        with self._conn() as c:
            c.execute("DELETE FROM models WHERE id = ?", (mid,))

    def star_model(self, mid: str) -> int:
        with self._conn() as c:
            c.execute("UPDATE models SET stars = stars + 1 WHERE id = ?", (mid,))
            row = c.execute(
                "SELECT stars FROM models WHERE id = ?", (mid,)
            ).fetchone()
        return int(row["stars"]) if row else 0

    def models(self) -> dict[str, dict]:
        with self._conn() as c:
            return {
                r["id"]: dict(r)
                for r in c.execute("SELECT * FROM models ORDER BY date DESC")
            }
