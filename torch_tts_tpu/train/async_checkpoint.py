"""Asynchronous checkpointing: the step loop never waits on serialization/IO.

The reference saves synchronously on rank 0 (vits2/utils.py:48-63 via
train.py:434-528) — the whole step loop stalls for the file write. Here the
save is split into a *snapshot* (device->host fetch, synchronous — required
for a consistent state while the optimizer keeps mutating device buffers)
and a *write* (serialize + fsync-rename), with the write off the step path.
Two backends:

- "thread" (default): snapshot to numpy, then a single background writer
  thread emits the SAME ckpt_<step>.msgpack format as train/checkpoint.py —
  resume paths, the converter CLI, and keep-N pruning all keep working
  unchanged. Single-host (or lead-gated multi-host with replicated state).

- "orbax": orbax.checkpoint.CheckpointManager with async array persistence.
  This is the multi-host path: every process participates in the save and
  writes only its *addressable* shards of GSPMD-sharded arrays (a
  lead-gated np.asarray would have to all-gather the globals — or simply
  fail for non-fully-addressable arrays), with orbax's barrier/atomic-commit
  protocol sequencing the directory rename. Layout:
  <model_dir>/orbax/<step>/ managed by orbax, keep-N via
  CheckpointManagerOptions(max_to_keep).

`wait()` joins all pending writes; the trainer calls it at the end of
train() and before raising the non-finite abort so a crash never truncates
the final checkpoint.
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from typing import Any, Optional

import jax
import numpy as np

from torch_tts_tpu.train import checkpoint as sync_ckpt

logger = logging.getLogger(__name__)


class AsyncCheckpointer:
    """Backend-dispatching async saver. See module docstring."""

    def __init__(self, backend: str = "thread"):
        if backend not in ("thread", "orbax"):
            raise ValueError(f"unknown async checkpoint backend: {backend}")
        self.backend = backend
        self._mgr = None         # orbax CheckpointManager, lazy per model_dir
        self._mgr_dir = None
        self._q: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None

    # -- thread backend ----------------------------------------------------

    def _ensure_worker(self):
        if self._worker is None or not self._worker.is_alive():
            self._worker = threading.Thread(
                target=self._drain, name="ckpt-writer", daemon=True
            )
            self._worker.start()

    def _drain(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                model_dir, step, host_tree, keep = item
                # identical on-disk artifact to the sync path
                from flax import serialization

                path = os.path.join(model_dir, f"ckpt_{step}.msgpack")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(serialization.msgpack_serialize(host_tree))
                os.replace(tmp, path)
                logger.info("Saved checkpoint (async): %s", path)
                sync_ckpt.remove_old_checkpoints(model_dir, keep=keep)
            except BaseException as e:  # surfaced at the next save()/wait()
                logger.exception("async checkpoint write failed")
                self._err = e
            finally:
                self._q.task_done()

    # -- orbax backend -----------------------------------------------------

    def _orbax_manager(self, model_dir: str, keep: int):
        import orbax.checkpoint as ocp

        odir = os.path.abspath(os.path.join(model_dir, "orbax"))
        if self._mgr is None or self._mgr_dir != odir:
            if self._mgr is not None:
                self._mgr.wait_until_finished()
            os.makedirs(odir, exist_ok=True)
            self._mgr = ocp.CheckpointManager(
                odir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=keep, enable_async_checkpointing=True
                ),
            )
            self._mgr_dir = odir
        return self._mgr

    # -- public API --------------------------------------------------------

    def save(self, model_dir: str, step: int, tree: Any, keep: int = 3) -> None:
        """Snapshot `tree` now; persist it in the background.

        thread backend: call on the lead process only (like the sync saver).
        orbax backend: call on EVERY process — the save is collective.
        """
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("previous async checkpoint failed") from err
        os.makedirs(model_dir, exist_ok=True)
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            mgr = self._orbax_manager(model_dir, keep)
            mgr.save(step, args=ocp.args.StandardSave(
                sync_ckpt_state_dict(tree)))
            return
        from flax import serialization

        # synchronous consistent snapshot; serialization/IO goes to the
        # worker. np.array (not asarray): host-resident numpy leaves must be
        # COPIED, or caller mutations race the background write.
        host_tree = jax.tree.map(
            lambda x: np.array(x), serialization.to_state_dict(tree)
        )
        self._ensure_worker()
        self._q.put((model_dir, step, host_tree, keep))

    def restore(self, model_dir: str, target: Any) -> Any:
        """Restore the newest checkpoint this backend knows about, into the
        structure of `target` (orbax: typed by target's shardings; thread:
        lenient msgpack merge). Returns target unchanged if none exists."""
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            odir = os.path.abspath(os.path.join(model_dir, "orbax"))
            if not os.path.isdir(odir):
                return target
            mgr = self._orbax_manager(model_dir, keep=3)
            step = mgr.latest_step()
            if step is None:
                return target
            abstract = jax.tree.map(
                ocp.utils.to_shape_dtype_struct, sync_ckpt_state_dict(target)
            )
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(abstract)
            )
            from flax import serialization

            return serialization.from_state_dict(target, restored)
        latest = sync_ckpt.latest_checkpoint(model_dir)
        if latest is None:
            return target
        return sync_ckpt.restore_checkpoint(latest, target)

    def latest_step(self, model_dir: str) -> Optional[int]:
        if self.backend == "orbax":
            odir = os.path.abspath(os.path.join(model_dir, "orbax"))
            if not os.path.isdir(odir):
                return None
            return self._orbax_manager(model_dir, keep=3).latest_step()
        latest = sync_ckpt.latest_checkpoint(model_dir)
        if latest is None:
            return None
        return int(sync_ckpt._CKPT_RE.search(latest).group(1))

    def wait(self) -> None:
        """Block until every pending save is durably on disk."""
        if self.backend == "orbax":
            if self._mgr is not None:
                self._mgr.wait_until_finished()
        else:
            self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint failed") from err

    def close(self) -> None:
        self.wait()
        if self.backend == "orbax":
            if self._mgr is not None:
                self._mgr.close()
                self._mgr = None
        elif self._worker is not None and self._worker.is_alive():
            self._q.put(None)
            self._worker.join(timeout=30)
            self._worker = None


def sync_ckpt_state_dict(tree: Any):
    """flax state-dict view of a train state (plain nested dicts of arrays;
    what both backends persist)."""
    from flax import serialization

    return serialization.to_state_dict(tree)
