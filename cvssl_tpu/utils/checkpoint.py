"""Checkpointing with the reference's naming contract.

Two tiers like the reference (SURVEY §5):
  (a) weights-only best/periodic: ``{model}_best_model.ckpt``,
      ``iter_{k}_dice_{d}.ckpt``, ``iter_{k}.ckpt``
      (``train_fully_supervised_2D.py:163-181``);
  (b) full training state (params, opt state, EMA teacher, step, RNG,
      method extra) for resume (``utils/util.py:55-123``).

Serialization is flax msgpack (single file, atomic rename) — a deliberate
lightweight choice over orbax's directory format so the reference's
"a checkpoint is a file" contract holds.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Optional

import jax
from flax import serialization


def _atomic_write(path: str, data: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_weights(path: str, params) -> None:
    _atomic_write(path, serialization.to_bytes(params))


def load_weights(path: str, target):
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_train_state(snapshot_path: str, state, iteration: int,
                     meta: Optional[dict] = None) -> str:
    """Full-state checkpoint: ``model_iter_{k}.ckpt`` (reference naming,
    ``utils/util.py:113-123``). ``meta`` carries loop-level scalars that
    must survive resume — notably per-model ``best_dice`` (the reference
    forgets it, ``util.py:55-123``, so a resumed run can overwrite
    ``{model}_best_model.ckpt`` with a worse model; we fix that)."""
    path = os.path.join(snapshot_path, f"model_iter_{iteration}.ckpt")
    _atomic_write(path, serialization.to_bytes(
        {"state": state, "meta": meta or {}}))
    return path


def restore_latest(snapshot_path: str, target,
                   meta_target: Optional[dict] = None
                   ) -> tuple[Optional[object], int, dict]:
    """Find and load the newest ``model_iter_*.ckpt`` (reference
    ``utils/util.py:76-110`` restore_model). Returns (state, iteration,
    meta) or (None, 0, {})."""
    paths = glob.glob(os.path.join(snapshot_path, "model_iter_*.ckpt"))
    best, best_it = None, -1
    for p in paths:
        m = re.search(r"model_iter_(\d+)\.ckpt$", p)
        if m and int(m.group(1)) > best_it:
            best, best_it = p, int(m.group(1))
    if best is None:
        return None, 0, {}
    try:
        payload = load_weights(best, {"state": target,
                                      "meta": meta_target or {}})
    except (ValueError, KeyError):
        # legacy layout (pre-meta): the file holds the raw state bytes
        return load_weights(best, target), best_it, {}
    return payload["state"], best_it, payload["meta"]


def prune_old(snapshot_path: str, keep: int = 2):
    paths = sorted(
        glob.glob(os.path.join(snapshot_path, "model_iter_*.ckpt")),
        key=lambda p: int(re.search(r"model_iter_(\d+)", p).group(1)))
    for p in paths[:-keep]:
        os.remove(p)


def to_host(tree):
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)
