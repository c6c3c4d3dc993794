"""webui server: model discovery, serving, range requests, auth.

Counterpart coverage for the reference's Express server routes
(webui/server.cjs + routes/auth.cjs) — ours is stdlib Python; the JS viewer
assets are validated structurally (test_data_io.py holds the .splat
byte-format contract the viewer parses).
"""

import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest

from webui.server import discover_models, make_server


@pytest.fixture()
def splat_tree(tmp_path):
    from dogs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
    from dogs_tpu.fields.io import save_splat
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    n = 17
    params = GaussianParams(
        xyz=jnp.asarray(rng.randn(n, 3), jnp.float32),
        feat_dc=jnp.asarray(rng.randn(n, 1, 3), jnp.float32),
        feat_rest=jnp.zeros((n, 15, 3), jnp.float32),
        log_scale=jnp.asarray(rng.randn(n, 3) * 0.1 - 3, jnp.float32),
        quat=jnp.asarray(rng.randn(n, 4), jnp.float32),
        logit_opacity=inverse_sigmoid(
            jnp.asarray(rng.uniform(0.2, 0.9, (n, 1)), jnp.float32)
        ),
    )
    d = tmp_path / "exp1" / "export"
    d.mkdir(parents=True)
    save_splat(str(d / "model.splat"), params)
    return tmp_path, n


@pytest.fixture()
def server(splat_tree):
    root, n = splat_tree
    srv = make_server(str(root), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, n
    srv.shutdown()


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req) as r:
        return r.status, r.read(), dict(r.headers)


def test_discover_models(splat_tree):
    root, _ = splat_tree
    models = discover_models(root)
    assert list(models) == ["exp1__export__model"]


def test_model_list_and_bytes(server):
    base, n = server
    _, body, _ = _get(f"{base}/api/models")
    lst = json.loads(body)
    assert lst == [
        {"id": "exp1__export__model", "bytes": n * 32, "splats": n}
    ]
    _, raw, _ = _get(f"{base}/api/models/exp1__export__model")
    assert len(raw) == n * 32
    # Records parse as the viewer expects: f32 positions are finite.
    pos = np.frombuffer(raw, np.uint8).reshape(n, 32)[:, :12]
    assert np.isfinite(pos.copy().view(np.float32)).all()


def test_range_request_progressive_prefix(server):
    base, n = server
    st, part, hdrs = _get(
        f"{base}/api/models/exp1__export__model",
        headers={"Range": "bytes=0-63"},
    )
    assert st == 206
    assert len(part) == 64  # first two records
    assert hdrs["Content-Range"] == f"bytes 0-63/{n * 32}"


def test_static_viewer_assets(server):
    base, _ = server
    st, html, _ = _get(f"{base}/")
    assert st == 200 and b"SplatViewer" in html
    st, js, _ = _get(f"{base}/static/viewer.js")
    assert st == 200 and b"drawArraysInstanced" in js
    st, wk, _ = _get(f"{base}/static/sorter.worker.js")
    assert st == 200 and b"postMessage" in wk


def test_unknown_routes(server):
    base, _ = server
    for path in ("/api/models/nope", "/static/../server.py", "/zzz"):
        with pytest.raises(urllib.error.HTTPError):
            _get(f"{base}{path}")


def test_token_auth(splat_tree):
    root, _ = splat_tree
    srv = make_server(str(root), port=0, token="s3cret")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{base}/api/models")
        assert ei.value.code == 401
        st, _, _ = _get(f"{base}/api/models",
                        headers={"Authorization": "Bearer s3cret"})
        assert st == 200
        st, _, _ = _get(f"{base}/api/models?token=s3cret")
        assert st == 200
        # Static assets stay public (the page must load to prompt).
        st, _, _ = _get(f"{base}/")
        assert st == 200
    finally:
        srv.shutdown()


def _post(url, data=b"", headers=None, method="POST"):
    req = urllib.request.Request(url, data=data, headers=headers or {},
                                 method=method)
    with urllib.request.urlopen(req) as r:
        return r.status, r.read(), dict(r.headers)


def _jpost(url, obj, headers=None):
    h = {"Content-Type": "application/json", **(headers or {})}
    return _post(url, json.dumps(obj).encode(), h)


def test_upload_gallery_delete_open_mode(server):
    """Model-zoo slice in open mode (no users, no admin token): upload a
    .splat, see it in the list + gallery with metadata, star it, delete it
    (reference webui routes/index.cjs + delete.cjs + db.cjs models table)."""
    base, n = server
    body = bytes(range(32)) * 3
    st, resp, _ = _post(f"{base}/api/models?name=fresh", body)
    assert st == 201 and json.loads(resp) == {
        "id": "uploads__fresh", "bytes": 96, "splats": 3
    }
    lst = json.loads(_get(f"{base}/api/models")[1])
    up = [m for m in lst if m["id"] == "uploads__fresh"]
    assert up and up[0]["owner"] == "anonymous" and up[0]["stars"] == 0
    # Discovered-on-disk models carry no DB metadata.
    disk = [m for m in lst if m["id"] == "exp1__export__model"]
    assert disk and "owner" not in disk[0]
    st, stars, _ = _post(f"{base}/api/models/uploads__fresh/star")
    assert json.loads(stars) == {"stars": 1}
    st, page, _ = _get(f"{base}/gallery")
    assert b"uploads__fresh" in page and b"1 \xe2\x98\x85" in page
    st, _, _ = _post(f"{base}/api/models/uploads__fresh", method="DELETE")
    assert st == 200
    assert all(
        m["id"] != "uploads__fresh"
        for m in json.loads(_get(f"{base}/api/models")[1])
    )


def test_upload_size_cap_and_validation(splat_tree):
    root, _ = splat_tree
    from webui.server import make_server as mk

    srv = mk(str(root), port=0, max_upload_bytes=64)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/api/models?name=big", b"\0" * 128)
        assert ei.value.code == 413
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/api/models?name=odd", b"\0" * 33)
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/api/models?name=../evil", b"\0" * 32)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_user_accounts_lock_api(server):
    """Once a user exists, anonymous API access closes; login tokens open it
    (reference auth.cjs passport-local -> stdlib pbkdf2 sessions)."""
    base, _ = server
    st, _, _ = _jpost(f"{base}/api/auth/signup",
                      {"username": "alice", "password": "letmein"})
    assert st == 201
    # Duplicate signup rejected.
    with pytest.raises(urllib.error.HTTPError) as ei:
        _jpost(f"{base}/api/auth/signup",
               {"username": "alice", "password": "x"})
    assert ei.value.code == 409
    # Anonymous reads now rejected; static stays public.
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{base}/api/models")
    assert ei.value.code == 401
    assert _get(f"{base}/")[0] == 200
    # Bad password rejected; good one yields a working session token.
    with pytest.raises(urllib.error.HTTPError):
        _jpost(f"{base}/api/auth/login",
               {"username": "alice", "password": "wrong"})
    st, resp, _ = _jpost(f"{base}/api/auth/login",
                         {"username": "alice", "password": "letmein"})
    tok = json.loads(resp)["token"]
    hdr = {"Authorization": f"Bearer {tok}"}
    assert _get(f"{base}/api/models", headers=hdr)[0] == 200
    assert json.loads(_get(f"{base}/api/users", headers=hdr)[1]) == ["alice"]
    # Uploads record the session's owner; a second user cannot delete them.
    _post(f"{base}/api/models?name=mine", b"\0" * 32, headers=hdr)
    _jpost(f"{base}/api/auth/signup", {"username": "bob", "password": "pw"})
    _, resp, _ = _jpost(f"{base}/api/auth/login",
                        {"username": "bob", "password": "pw"})
    bob = {"Authorization": f"Bearer {json.loads(resp)['token']}"}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/api/models/uploads__mine", headers=bob, method="DELETE")
    assert ei.value.code == 403
    st, _, _ = _post(f"{base}/api/models/uploads__mine", headers=hdr,
                     method="DELETE")
    assert st == 200


def test_discover_and_serve_gaussian_ply(tmp_path):
    """3DGS .ply exports are listed (with header-derived splat counts) and
    served; COLMAP *_points.ply point clouds are excluded. Mirrors the
    reference viewer's multi-format ingestion (webui/src/loaders/)."""
    import jax.numpy as jnp

    from dogs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
    from dogs_tpu.fields.io import save_colmap_ply, save_gaussian_ply

    rng = np.random.RandomState(3)
    n = 9
    params = GaussianParams(
        xyz=jnp.asarray(rng.randn(n, 3), jnp.float32),
        feat_dc=jnp.asarray(rng.randn(n, 1, 3), jnp.float32),
        feat_rest=jnp.zeros((n, 15, 3), jnp.float32),
        log_scale=jnp.asarray(rng.randn(n, 3) * 0.1 - 3, jnp.float32),
        quat=jnp.asarray(rng.randn(n, 4), jnp.float32),
        logit_opacity=inverse_sigmoid(
            jnp.asarray(rng.uniform(0.2, 0.9, (n, 1)), jnp.float32)
        ),
    )
    d = tmp_path / "exp2" / "export"
    d.mkdir(parents=True)
    save_gaussian_ply(str(d / "model.ply"), params)
    save_colmap_ply(str(d / "model_points.ply"), params)

    models = discover_models(str(tmp_path))
    assert "exp2__export__model.ply" in models
    assert not any("model_points" in k for k in models)

    srv = make_server(str(tmp_path), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        entries = json.loads(_get(f"{base}/api/models")[1])
        ply = [e for e in entries if e["id"].endswith(".ply")]
        assert ply and ply[0]["splats"] == n
        st, body, _ = _get(f"{base}/api/models/exp2__export__model.ply")
        assert st == 200 and body[:3] == b"ply"
    finally:
        srv.shutdown()


def test_viewer_js_declares_ply_ingestion():
    """Structural: the viewer detects the ply magic in setData and ships a
    plyToSplat converter covering the exporter's property set (no JS runtime
    in this image to execute it; byte semantics are pinned by
    test_data_io.py's splat/ply golden tests)."""
    import pathlib

    src = (pathlib.Path(__file__).parent.parent
           / "webui" / "static" / "viewer.js").read_text()
    assert "plyToSplat" in src
    assert "binary_little_endian" in src
    for prop in ("f_dc_", "opacity", "scale_", "rot_0", "element vertex"):
        assert prop in src, prop
