"""Checkpointing: save/restore full train states with keep-last-N retention.

Mirrors the reference semantics (/root/reference/vits2/utils.py:48-111):
numbered checkpoints per step, numeric-sorted `latest_checkpoint`,
`remove_old_checkpoints` keeping the last 3, and *lenient* restore — keys
missing from the file keep their freshly-initialized values, extra keys are
ignored (utils.py:31-41) so architecture drift doesn't brick a resume.

Serialization is flax msgpack over the raw pytree; arrays come back as numpy
and are re-device-put by the caller (or lazily by jit). A single file holds
{step, params/opt for every net} — the TPU-side equivalent of the reference's
G_/D_/DUR_ file triple.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)

_CKPT_RE = re.compile(r"ckpt_(\d+)\.msgpack$")


def save_checkpoint(model_dir: str, step: int, tree: Any, keep: int = 3) -> str:
    """Serialize `tree` to <model_dir>/ckpt_<step>.msgpack; prune old ones."""
    os.makedirs(model_dir, exist_ok=True)
    host_tree = jax.tree.map(np.asarray, serialization.to_state_dict(tree))
    path = os.path.join(model_dir, f"ckpt_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(host_tree))
    os.replace(tmp, path)
    logger.info("Saved checkpoint: %s", path)
    remove_old_checkpoints(model_dir, keep=keep)
    return path


def list_checkpoints(model_dir: str) -> List[str]:
    if not os.path.isdir(model_dir):
        return []
    files = [f for f in os.listdir(model_dir) if _CKPT_RE.search(f)]
    files.sort(key=lambda f: int(_CKPT_RE.search(f).group(1)))
    return [os.path.join(model_dir, f) for f in files]


def latest_checkpoint(model_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(model_dir)
    return ckpts[-1] if ckpts else None


def remove_old_checkpoints(model_dir: str, keep: int = 3) -> None:
    ckpts = list_checkpoints(model_dir)
    for path in ckpts[:-keep] if keep > 0 else []:
        os.remove(path)
        logger.info("Removed old checkpoint: %s", path)


def _merge_lenient(target: Any, loaded: Any, path: str = "") -> Any:
    """Recursively take loaded values where structure+shape match; keep the
    target's value (and warn) otherwise."""
    if isinstance(target, dict):
        if not isinstance(loaded, dict):
            logger.warning("checkpoint: %s is not a dict, keeping init", path)
            return target
        out = {}
        for k, v in target.items():
            if k in loaded:
                out[k] = _merge_lenient(v, loaded[k], f"{path}/{k}")
            else:
                logger.warning("checkpoint: missing %s/%s, keeping init", path, k)
                out[k] = v
        return out
    if hasattr(target, "shape") and hasattr(loaded, "shape"):
        if tuple(target.shape) != tuple(np.shape(loaded)):
            logger.warning(
                "checkpoint: shape mismatch at %s (%s vs %s), keeping init",
                path, target.shape, np.shape(loaded),
            )
            return target
        return loaded
    return loaded


def restore_checkpoint(path: str, target: Any, lenient: bool = True) -> Any:
    """Load a checkpoint file into the structure of `target`."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    target_state = serialization.to_state_dict(target)
    merged = _merge_lenient(target_state, raw) if lenient else raw
    return serialization.from_state_dict(target, merged)


def average_checkpoints(paths: List[str], target: Any,
                        subtree: Optional[str] = None) -> Any:
    """Uniform average of float leaves across checkpoints (standard TTS
    inference-smoothing trick; no reference counterpart — its utils.py loads
    single files only). Non-float leaves (step counters, int buffers) are
    taken from the LAST checkpoint. `subtree` restricts averaging to one
    top-level key (e.g. "params_g") so optimizer state is never averaged;
    the rest of the tree also comes from the last checkpoint."""
    if not paths:
        raise ValueError("average_checkpoints: no checkpoint paths given")
    acc: Optional[Dict] = None
    last = None
    for p in paths:
        with open(p, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        last = raw
        part = raw[subtree] if subtree else raw
        if acc is None:
            acc = jax.tree.map(
                lambda a: a.astype(np.float64)
                if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
                part,
            )
        else:
            acc = jax.tree.map(
                lambda s, a: s + a
                if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
                acc, part,
            )
    n = float(len(paths))
    avg = jax.tree.map(
        lambda s: (s / n).astype(np.float32)
        if np.issubdtype(np.asarray(s).dtype, np.floating) else s,
        acc,
    )
    merged = dict(last)
    if subtree:
        merged[subtree] = avg
    else:
        merged = avg
    target_state = serialization.to_state_dict(target)
    return serialization.from_state_dict(
        target, _merge_lenient(target_state, merged)
    )
