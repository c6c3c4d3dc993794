"""Splat model-zoo server — TPU-repo counterpart of the reference webui
(webui/server.cjs: Express static server + model routes; db.cjs: SQLite
users/models; routes/auth.cjs: passport-local login; routes/delete.cjs).
Stdlib-only: no node/npm in the serving image, and nothing about serving
32-byte splat records needs a JS runtime.

Routes:
  GET  /                      -> viewer page (webui/static/index.html)
  GET  /gallery               -> model gallery page (metadata + deep links)
  GET  /static/<f>            -> viewer assets
  GET  /api/models            -> JSON list of models (discovered + uploaded;
                                 uploaded ones carry owner/title/date/stars)
  GET  /api/models/<id>       -> raw .splat bytes (Range supported: the viewer
                                 streams progressively; exports are sorted by
                                 volume x opacity so partial reads look right)
  POST /api/models?name=<id>  -> upload a .splat (raw body; size-capped)
  POST /api/models/<id>/star  -> +1 star
  DELETE /api/models/<id>     -> delete an uploaded model (owner or admin)
  POST /api/auth/signup       -> {"username","password"} -> create user
  POST /api/auth/login        -> {"username","password"} -> {"token"}
  GET  /api/users             -> usernames (authorized only)

Auth layers (the reference uses passport sessions + SQLite users — here the
API-server equivalents):
  * `--token TOKEN` is the admin bearer: full access.
  * user sessions: signup/login against the SQLite users table; the returned
    session token rides `Authorization: Bearer <t>` (or `?token=`).
  * OPEN mode (no --token AND no users in the DB): reads and writes are
    anonymous — a dev convenience matching the reference's seeded dev user.
Once `--token` is set or a user exists, API reads/writes require auth;
static assets stay public so the login page can load.

Usage:
  python -m webui.server --models-dir out/ [--port 8080] [--token SECRET]
"""

from __future__ import annotations

import argparse
import html
import json
import mimetypes
import os
import re
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

from webui.db import ZooDB

STATIC_DIR = Path(__file__).resolve().parent / "static"
_ID_RE = re.compile(r"^[A-Za-z0-9_\-.]+$")
_DISCOVER_TTL_S = 2.0
_discover_cache: dict[str, tuple[float, dict]] = {}


def discover_models(models_dir: str | os.PathLike) -> dict[str, Path]:
    """Map model-id -> .splat/.ply path. Ids are the path under models_dir
    with '/' replaced by '__' (exports live at out/<expname>/export/
    model.splat). 3DGS .ply exports are listed too (ids keep their .ply
    suffix; the viewer converts them client-side, mirroring the reference
    viewer's multi-format loaders, webui/src/loaders/PlyLoader.js) —
    excluding *_points.ply, which are COLMAP point clouds, not splats.
    Cached for a couple of seconds: the viewer issues many ranged requests
    per model load and each would otherwise re-walk the output tree."""
    key = str(models_dir)
    hit = _discover_cache.get(key)
    now = time.monotonic()
    if hit is not None and now - hit[0] < _DISCOVER_TTL_S:
        return hit[1]
    root = Path(models_dir)
    out: dict[str, Path] = {}
    if not root.is_dir():
        return out
    for p in sorted(root.rglob("*.splat")):
        rel = p.relative_to(root)
        mid = "__".join(rel.with_suffix("").parts)
        out[mid] = p
    for p in sorted(root.rglob("*.ply")):
        if p.name.endswith("_points.ply"):
            continue
        rel = p.relative_to(root)
        out["__".join(rel.parts)] = p
    # GaussianSplats3D .ksplat containers (ids keep their suffix; converted
    # client-side, mirroring webui/src/loaders/ksplat/KSplatLoader.js).
    for p in sorted(root.rglob("*.ksplat")):
        rel = p.relative_to(root)
        out["__".join(rel.parts)] = p
    _discover_cache[key] = (now, out)
    return out


def _ksplat_splat_count(path: Path) -> int:
    """Total splat count from the 4096-byte .ksplat file header (u32[4])."""
    try:
        with open(path, "rb") as f:
            head = f.read(20)
        return int.from_bytes(head[16:20], "little") if len(head) >= 20 else 0
    except OSError:
        return 0


def _ply_vertex_count(path: Path) -> int:
    """Read `element vertex N` from a ply header (header is ASCII, tiny)."""
    try:
        with open(path, "rb") as f:
            head = f.read(65536)
        m = re.search(rb"element vertex (\d+)", head)
        return int(m.group(1)) if m else 0
    except OSError:
        return 0


class ViewerHandler(BaseHTTPRequestHandler):
    server_version = "dogs-tpu-webui/1.1"
    models_dir: str = "out"
    token: str | None = None
    db: ZooDB | None = None
    sessions: dict[str, str] = {}  # session-token -> username (class-shared)
    max_upload_bytes: int = 512 << 20

    # -- helpers ----------------------------------------------------------
    def _send(self, code: int, body: bytes, ctype: str = "application/json",
              extra: dict[str, str] | None = None) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Access-Control-Allow-Origin", "*")
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _json(self, code: int, obj) -> None:
        self._send(code, json.dumps(obj).encode())

    def _bearer(self) -> str | None:
        hdr = self.headers.get("Authorization", "")
        if hdr.startswith("Bearer "):
            return hdr[len("Bearer "):]
        q = (self.path.split("?", 1) + [""])[1]
        m = re.search(r"(?:^|&)token=([^&]+)", q)
        return m.group(1) if m else None

    def _user(self) -> str | None:
        """Authenticated identity: 'admin' for the --token bearer, the
        session's username for a logged-in user, 'anonymous' in open mode."""
        t = self._bearer()
        if self.token and t == self.token:
            return "admin"
        if t in self.sessions:
            return self.sessions[t]
        if self.token is None and (self.db is None or not self.db.has_users()):
            return "anonymous"
        return None

    def _authorized(self) -> bool:
        return self._user() is not None

    def _read_body(self, cap: int | None = None) -> bytes | None:
        n = int(self.headers.get("Content-Length", 0) or 0)
        if cap is not None and n > cap:
            return None
        return self.rfile.read(n)

    def log_message(self, fmt, *args):  # quiet by default
        if os.environ.get("WEBUI_VERBOSE"):
            super().log_message(fmt, *args)

    # -- GET routes ---------------------------------------------------------
    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        path = self.path.split("?", 1)[0]
        if path == "/" or path == "/index.html":
            return self._static("index.html")
        if path.startswith("/static/"):
            return self._static(path[len("/static/"):])
        if not self._authorized():
            return self._json(401, {"error": "unauthorized"})
        if path == "/gallery":
            return self._gallery()
        if path == "/api/models":
            return self._json(200, self._model_list())
        if path == "/api/users":
            users = self.db.users() if self.db else []
            return self._json(200, users)
        if path.startswith("/api/models/"):
            return self._model(path[len("/api/models/"):])
        self._json(404, {"error": "not found"})

    def _model_list(self) -> list[dict]:
        models = discover_models(self.models_dir)
        meta = self.db.models() if self.db else {}
        out = []
        for mid, p in models.items():
            n = (_ply_vertex_count(p) if p.suffix == ".ply"
                 else _ksplat_splat_count(p) if p.suffix == ".ksplat"
                 else p.stat().st_size // 32)
            entry = {"id": mid, "bytes": p.stat().st_size, "splats": n}
            m = meta.get(mid)
            if m:
                entry.update(
                    owner=m["owner"], title=m["title"], date=m["date"],
                    stars=m["stars"],
                )
            out.append(entry)
        return out

    def _gallery(self) -> None:
        """Server-rendered gallery — the reference's EJS index page
        (webui/views + routes/index.cjs fetch_models) without a template
        engine."""
        rows = []
        for m in self._model_list():
            extra = ""
            if "owner" in m:
                extra = (f"<td>{html.escape(m['title'])}</td>"
                         f"<td>{html.escape(m['owner'])}</td>"
                         f"<td>{html.escape(m['date'])}</td>"
                         f"<td>{m['stars']} ★</td>")
            else:
                extra = "<td colspan=4><em>discovered on disk</em></td>"
            rows.append(
                f"<tr><td><a href='/#model={m['id']}'>{html.escape(m['id'])}"
                f"</a></td><td>{m['splats']:,}</td>{extra}</tr>"
            )
        page = (
            "<!doctype html><title>dogs_tpu model zoo</title>"
            "<style>body{font:14px sans-serif;margin:2em}td,th{padding:.3em "
            ".8em;border-bottom:1px solid #ddd}a{text-decoration:none}</style>"
            "<h1>Model zoo</h1><table><tr><th>model</th><th>splats</th>"
            "<th>title</th><th>owner</th><th>date</th><th>stars</th></tr>"
            + "".join(rows) + "</table>"
        )
        self._send(200, page.encode(), "text/html; charset=utf-8")

    def _static(self, name: str) -> None:
        f = (STATIC_DIR / name).resolve()
        if not f.is_file() or STATIC_DIR.resolve() not in f.parents:
            return self._send(404, b"not found", "text/plain")
        ctype = mimetypes.guess_type(str(f))[0] or "application/octet-stream"
        self._send(200, f.read_bytes(), ctype)

    def _model(self, mid: str) -> None:
        if not _ID_RE.match(mid):
            return self._json(400, {"error": "bad id"})
        p = discover_models(self.models_dir).get(mid)
        if p is None:
            return self._json(404, {"error": "unknown model"})
        # Serve ranges by seek/read — the viewer streams a multi-GB export
        # progressively, and reading the whole file per ranged request
        # would cost full-file IO x chunks x concurrent viewers.
        size = p.stat().st_size
        rng = self.headers.get("Range")
        with open(p, "rb") as f:
            if rng:
                m = re.match(r"bytes=(\d+)-(\d*)", rng)
                if m:
                    lo = int(m.group(1))
                    hi = int(m.group(2)) + 1 if m.group(2) else size
                    hi = min(hi, size)
                    lo = min(lo, hi)
                    f.seek(lo)
                    return self._send(
                        206, f.read(hi - lo), "application/octet-stream",
                        {"Content-Range": f"bytes {lo}-{hi - 1}/{size}"},
                    )
            self._send(200, f.read(), "application/octet-stream")

    # -- POST / DELETE routes -------------------------------------------------
    def do_POST(self) -> None:  # noqa: N802
        path, _, query = self.path.partition("?")
        if path == "/api/auth/signup":
            return self._signup()
        if path == "/api/auth/login":
            return self._login()
        if not self._authorized():
            return self._json(401, {"error": "unauthorized"})
        m = re.match(r"^/api/models/([A-Za-z0-9_\-.]+)/star$", path)
        if m:
            if self.db is None:
                return self._json(400, {"error": "no db"})
            return self._json(200, {"stars": self.db.star_model(m.group(1))})
        if path == "/api/models":
            return self._upload(query)
        self._json(404, {"error": "not found"})

    def do_DELETE(self) -> None:  # noqa: N802
        path = self.path.split("?", 1)[0]
        if not path.startswith("/api/models/"):
            return self._json(404, {"error": "not found"})
        user = self._user()
        if user is None:
            return self._json(401, {"error": "unauthorized"})
        mid = path[len("/api/models/"):]
        if not _ID_RE.match(mid):
            return self._json(400, {"error": "bad id"})
        meta = self.db.get_model(mid) if self.db else None
        if meta is None:
            return self._json(404, {"error": "unknown or not deletable"})
        # Owner-or-admin, like the reference's ensureLoggedIn + owner check.
        if user not in ("admin", meta["owner"]) and not (
            user == "anonymous" and meta["owner"] == "anonymous"
        ):
            return self._json(403, {"error": "not the owner"})
        try:
            os.unlink(meta["path"])
        except FileNotFoundError:
            pass
        self.db.delete_model(mid)
        _discover_cache.clear()
        self._json(200, {"deleted": mid})

    def _json_body(self) -> dict | None:
        body = self._read_body(1 << 20)
        if body is None:
            return None
        try:
            obj = json.loads(body)
        except (ValueError, UnicodeDecodeError):
            return None
        return obj if isinstance(obj, dict) else None

    def _signup(self) -> None:
        obj = self._json_body()
        if not obj or not obj.get("username") or not obj.get("password"):
            return self._json(400, {"error": "username+password required"})
        if self.db is None:
            return self._json(400, {"error": "no db"})
        if not _ID_RE.match(obj["username"]):
            return self._json(400, {"error": "bad username"})
        if not self.db.create_user(obj["username"], obj["password"]):
            return self._json(409, {"error": "username taken"})
        self._json(201, {"created": obj["username"]})

    def _login(self) -> None:
        obj = self._json_body()
        if not obj or self.db is None or not self.db.verify_user(
            obj.get("username", ""), obj.get("password", "")
        ):
            return self._json(401, {"error": "bad credentials"})
        import secrets

        t = secrets.token_hex(16)
        self.sessions[t] = obj["username"]
        self._json(200, {"token": t})

    def _upload(self, query: str) -> None:
        # Full-segment match: a prefix match would accept name=../evil by
        # matching the ".." and stopping at the slash.
        m = re.search(r"(?:^|&)name=([A-Za-z0-9_\-.]+)(?:&|$)", query)
        if not m:
            return self._json(400, {"error": "name= required (id-safe chars)"})
        name = m.group(1)
        body = self._read_body(self.max_upload_bytes)
        if body is None:
            return self._json(413, {"error": "too large"})
        if len(body) == 0 or len(body) % 32 != 0:
            return self._json(400, {"error": "body must be 32-byte records"})
        up = Path(self.models_dir) / "uploads"
        up.mkdir(parents=True, exist_ok=True)
        dest = up / f"{name}.splat"
        dest.write_bytes(body)
        mid = f"uploads__{name}"
        if self.db is not None:
            self.db.add_model(mid, self._user() or "anonymous", name, str(dest))
        _discover_cache.clear()
        self._json(201, {"id": mid, "bytes": len(body),
                         "splats": len(body) // 32})


def make_server(models_dir: str, port: int = 0, token: str | None = None,
                host: str = "127.0.0.1", db_path: str | None = None,
                max_upload_bytes: int = 512 << 20) -> ThreadingHTTPServer:
    db = ZooDB(db_path or os.path.join(models_dir, "webui.db"))
    handler = type(
        "BoundHandler", (ViewerHandler,),
        {"models_dir": models_dir, "token": token, "db": db,
         "sessions": {}, "max_upload_bytes": max_upload_bytes},
    )
    return ThreadingHTTPServer((host, port), handler)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--models-dir", default="out")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--token", default=None)
    ap.add_argument("--db", default=None, help="sqlite path (default <models-dir>/webui.db)")
    ap.add_argument("--max-upload-mb", type=int, default=512)
    args = ap.parse_args()
    srv = make_server(args.models_dir, args.port, args.token, host=args.host,
                      db_path=args.db, max_upload_bytes=args.max_upload_mb << 20)
    print(f"dogs_tpu viewer on http://{args.host}:{args.port} "
          f"(models: {len(discover_models(args.models_dir))})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
