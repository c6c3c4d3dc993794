"""Splat model viewer server — TPU-repo counterpart of the reference webui
(webui/server.cjs: Express static server + model routes + auth). Stdlib-only:
no node/npm in the serving image, and nothing about serving 32-byte splat
records needs a JS runtime.

Routes:
  GET /                      -> viewer page (webui/static/index.html)
  GET /static/<f>            -> viewer assets
  GET /api/models            -> JSON list of discovered .splat models
  GET /api/models/<id>       -> raw .splat bytes (Range supported: the viewer
                                streams progressively; exports are sorted by
                                volume x opacity so partial reads look right)

Auth (optional): pass --token TOKEN; non-static requests must then carry
`Authorization: Bearer TOKEN` or `?token=` (the reference uses passport
sessions — a bearer token is the appropriate API-server equivalent).

Usage:
  python -m webui.server --models-dir out/ [--port 8080] [--token SECRET]
"""

from __future__ import annotations

import argparse
import json
import mimetypes
import os
import re
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

STATIC_DIR = Path(__file__).resolve().parent / "static"
_ID_RE = re.compile(r"^[A-Za-z0-9_\-.]+$")
_DISCOVER_TTL_S = 2.0
_discover_cache: dict[str, tuple[float, dict]] = {}


def discover_models(models_dir: str | os.PathLike) -> dict[str, Path]:
    """Map model-id -> .splat path. Ids are the path under models_dir with
    '/' replaced by '__' (exports live at out/<expname>/export/model.splat).
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
    _discover_cache[key] = (now, out)
    return out


class ViewerHandler(BaseHTTPRequestHandler):
    server_version = "dogs-tpu-webui/1.0"
    models_dir: str = "out"
    token: str | None = None

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

    def _authorized(self) -> bool:
        if not self.token:
            return True
        hdr = self.headers.get("Authorization", "")
        if hdr == f"Bearer {self.token}":
            return True
        return f"token={self.token}" in (self.path.split("?", 1) + [""])[1]

    def log_message(self, fmt, *args):  # quiet by default
        if os.environ.get("WEBUI_VERBOSE"):
            super().log_message(fmt, *args)

    # -- routes -----------------------------------------------------------
    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        path = self.path.split("?", 1)[0]
        if path == "/" or path == "/index.html":
            return self._static("index.html")
        if path.startswith("/static/"):
            return self._static(path[len("/static/"):])
        if not self._authorized():
            return self._send(401, b'{"error": "unauthorized"}')
        if path == "/api/models":
            models = discover_models(self.models_dir)
            body = json.dumps(
                [
                    {"id": mid, "bytes": p.stat().st_size,
                     "splats": p.stat().st_size // 32}
                    for mid, p in models.items()
                ]
            ).encode()
            return self._send(200, body)
        if path.startswith("/api/models/"):
            return self._model(path[len("/api/models/"):])
        self._send(404, b'{"error": "not found"}')

    def _static(self, name: str) -> None:
        f = (STATIC_DIR / name).resolve()
        if not f.is_file() or STATIC_DIR.resolve() not in f.parents:
            return self._send(404, b"not found", "text/plain")
        ctype = mimetypes.guess_type(str(f))[0] or "application/octet-stream"
        self._send(200, f.read_bytes(), ctype)

    def _model(self, mid: str) -> None:
        if not _ID_RE.match(mid):
            return self._send(400, b'{"error": "bad id"}')
        p = discover_models(self.models_dir).get(mid)
        if p is None:
            return self._send(404, b'{"error": "unknown model"}')
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


def make_server(models_dir: str, port: int = 0, token: str | None = None,
                host: str = "127.0.0.1") -> ThreadingHTTPServer:
    handler = type(
        "BoundHandler", (ViewerHandler,),
        {"models_dir": models_dir, "token": token},
    )
    return ThreadingHTTPServer((host, port), handler)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--models-dir", default="out")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--token", default=None)
    args = ap.parse_args()
    srv = make_server(args.models_dir, args.port, args.token, host=args.host)
    print(f"dogs_tpu viewer on http://{args.host}:{args.port} "
          f"(models: {len(discover_models(args.models_dir))})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
