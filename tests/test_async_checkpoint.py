"""Async checkpointing (train/async_checkpoint.py).

The thread backend must emit byte-format-compatible ckpt_<step>.msgpack
files (the sync reader restores them), prune to keep-N, and survive
overlapping saves. The orbax backend must round-trip a nested train-state
pytree, including sharded arrays on the 8-device CPU mesh, collectively.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_tts_tpu.train import checkpoint as sync_ckpt
from torch_tts_tpu.train.async_checkpoint import AsyncCheckpointer


def _tree(seed: int):
    rng = np.random.default_rng(seed)
    return {
        "step": jnp.asarray(seed, jnp.int32),
        "params_g": {
            "enc": {"w": jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)},
            "dec": {"b": jnp.asarray(rng.normal(size=(8,)), jnp.float32)},
        },
        "opt": {"mu": jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)},
    }


def _assert_trees_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )


def test_thread_backend_roundtrip_and_sync_compat(tmp_path):
    d = str(tmp_path)
    cp = AsyncCheckpointer("thread")
    tree = _tree(3)
    cp.save(d, 3, tree)
    cp.wait()
    # the sync reader restores the async writer's file
    path = sync_ckpt.latest_checkpoint(d)
    assert path.endswith("ckpt_3.msgpack")
    restored = sync_ckpt.restore_checkpoint(path, _tree(0))
    _assert_trees_equal(restored, tree)
    # and the async restore API agrees
    _assert_trees_equal(cp.restore(d, _tree(0)), tree)
    assert cp.latest_step(d) == 3
    cp.close()


def test_thread_backend_prunes_and_overlaps(tmp_path):
    d = str(tmp_path)
    cp = AsyncCheckpointer("thread")
    trees = {s: _tree(s) for s in range(1, 6)}
    for s in range(1, 6):  # overlapping saves, keep 2
        cp.save(d, s, trees[s], keep=2)
    cp.wait()
    files = sync_ckpt.list_checkpoints(d)
    assert [os.path.basename(f) for f in files] == [
        "ckpt_4.msgpack", "ckpt_5.msgpack",
    ]
    _assert_trees_equal(cp.restore(d, _tree(0)), trees[5])
    cp.close()


def test_thread_snapshot_is_consistent(tmp_path):
    """Mutating the live tree after save() must not affect what is written
    (the snapshot happens synchronously inside save())."""
    d = str(tmp_path)
    cp = AsyncCheckpointer("thread")
    tree = {"w": np.ones((4,), np.float32)}
    cp.save(d, 1, tree)
    tree["w"][:] = 7.0  # mutate the host buffer the caller still owns
    cp.wait()
    restored = cp.restore(d, {"w": np.zeros((4,), np.float32)})
    np.testing.assert_array_equal(restored["w"], np.ones((4,)))
    cp.close()


def test_orbax_backend_roundtrip(tmp_path):
    d = str(tmp_path)
    cp = AsyncCheckpointer("orbax")
    tree = _tree(11)
    cp.save(d, 11, tree)
    cp.wait()
    assert cp.latest_step(d) == 11
    restored = cp.restore(d, _tree(0))
    _assert_trees_equal(restored, tree)
    cp.close()


def test_orbax_backend_sharded_state(tmp_path):
    """Save/restore with mesh-sharded arrays (the multi-host shape of the
    problem on the 8-device CPU fixture): values must round-trip and the
    restore must come back loadable against the target structure."""
    from torch_tts_tpu.parallel import make_mesh, replicate

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device CPU fixture")
    d = str(tmp_path)
    mesh = make_mesh()
    tree = replicate(_tree(5), mesh)
    cp = AsyncCheckpointer("orbax")
    cp.save(d, 5, tree)
    cp.wait()
    restored = cp.restore(d, _tree(0))
    _assert_trees_equal(restored, jax.device_get(tree))
    cp.close()


def test_unknown_backend_raises():
    with pytest.raises(ValueError):
        AsyncCheckpointer("carrier-pigeon")


def test_average_checkpoints(tmp_path):
    """Uniform float averaging across checkpoints; ints from the last file;
    subtree= restricts averaging to the given top-level key."""
    import numpy as np

    from torch_tts_tpu.train import checkpoint as ckpt

    d = str(tmp_path / "avg")
    for i, step in enumerate((10, 20, 30)):
        tree = {
            "params_g": {"w": np.full((2, 2), float(i), np.float32)},
            "opt": {"mu": np.full((2,), float(10 * i), np.float32)},
            "step": np.asarray(step, np.int32),
        }
        ckpt.save_checkpoint(d, step, tree, keep=5)
    paths = ckpt.list_checkpoints(d)
    assert len(paths) == 3
    target = {
        "params_g": {"w": np.zeros((2, 2), np.float32)},
        "opt": {"mu": np.zeros((2,), np.float32)},
        "step": np.asarray(0, np.int32),
    }
    out = ckpt.average_checkpoints(paths, target, subtree="params_g")
    np.testing.assert_allclose(out["params_g"]["w"], 1.0)  # mean(0,1,2)
    np.testing.assert_allclose(out["opt"]["mu"], 20.0)  # last, not averaged
    assert int(out["step"]) == 30
    # no subtree: every float leaf averaged
    out2 = ckpt.average_checkpoints(paths, target)
    np.testing.assert_allclose(out2["opt"]["mu"], 10.0)
    assert int(out2["step"]) == 30
