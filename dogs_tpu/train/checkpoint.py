"""Checkpoint manager: save/load/resume with retention policy.

Capability parity with the reference CheckPointManager
(conerf/base/checkpoint_manager.py:12-249): step-stamped checkpoints plus a
rolling "latest" copy, `max_to_keep` retention, a checkpoints.txt index, and
resume-from-latest returning the start step. GS checkpoints store the raw
property tensors (not module state) exactly like the reference
(gaussian_trainer.py:515-573), here as one compressed npz of flattened
pytree leaves.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


FORMAT_VERSION = 1


def save_pytree(path: str, tree, extra: dict | None = None) -> None:
    arrays, _ = _flatten_with_paths(tree)
    meta = {"extra": extra or {}, "format_version": FORMAT_VERSION}
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_pytree(path: str, template):
    """Load into the structure of `template` (leaves matched by path)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"])) if "__meta__" in data else {}
    version = meta.get("format_version", 1)
    if version > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path} has format_version {version} > supported "
            f"{FORMAT_VERSION}; upgrade the code or re-export the checkpoint"
        )
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(x) for x in p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        tmpl_shape = getattr(leaf, "shape", None)
        if tmpl_shape is not None and tuple(arr.shape) != tuple(tmpl_shape):
            raise ValueError(
                f"checkpoint leaf {key} has shape {arr.shape}, template "
                f"expects {tmpl_shape} — resize the template (capacity "
                f"grow/shrink) before loading"
            )
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    ), meta.get("extra", {})


class CheckpointManager:
    """Directory layout: <dir>/model_{step:06d}.npz + model.npz (latest copy)
    + checkpoints.txt index."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        keep_every_n_hours: float | None = None,
    ):
        self.directory = directory
        self.max_to_keep = max_to_keep
        self.keep_every_n_hours = keep_every_n_hours
        self._kept_at = 0.0
        os.makedirs(directory, exist_ok=True)

    @property
    def index_path(self) -> str:
        return os.path.join(self.directory, "checkpoints.txt")

    def _index(self) -> list[str]:
        if not os.path.exists(self.index_path):
            return []
        with open(self.index_path) as f:
            return [ln.strip() for ln in f if ln.strip()]

    def _write_index(self, names: list[str]) -> None:
        with open(self.index_path, "w") as f:
            f.write("\n".join(names) + ("\n" if names else ""))

    def save(self, step: int, tree, extra: dict | None = None) -> str:
        name = f"model_{step:06d}.npz"
        path = os.path.join(self.directory, name)
        extra = dict(extra or {})
        extra["step"] = int(step)
        save_pytree(path, tree, extra)
        # Rolling latest copy (checkpoint_manager.py:61-96).
        latest = os.path.join(self.directory, "model.npz")
        tmp = latest + ".tmp"
        with open(path, "rb") as src, open(tmp, "wb") as dst:
            dst.write(src.read())
        os.replace(tmp, latest)

        names = [n for n in self._index() if n != name] + [name]
        # Retention: keep the newest max_to_keep (plus hourly keepers).
        now = time.time()
        protect = set()
        if (
            self.keep_every_n_hours
            and now - self._kept_at > self.keep_every_n_hours * 3600
        ):
            protect.add(name)
            self._kept_at = now
        while len(names) > self.max_to_keep:
            victim = next((n for n in names if n not in protect), None)
            if victim is None or victim == names[-1]:
                break
            names.remove(victim)
            vp = os.path.join(self.directory, victim)
            if os.path.exists(vp):
                os.remove(vp)
        self._write_index(names)
        return path

    def latest_path(self) -> str | None:
        latest = os.path.join(self.directory, "model.npz")
        if os.path.exists(latest):
            return latest
        names = self._index()
        if names:
            return os.path.join(self.directory, names[-1])
        return None

    def load(self, template, path: str | None = None):
        """Returns (tree, extra) from `path` or the latest checkpoint
        (checkpoint_manager.py:155-222 load_no_config)."""
        path = path or self.latest_path()
        if path is None:
            return None, {}
        return load_pytree(path, template)
