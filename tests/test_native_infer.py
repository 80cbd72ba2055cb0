"""Native inference server artifacts + text frontend.

export_infer_artifacts.py + csrc/driver/infer_main.cc form the no-Python
serving path (the inference counterpart of the native training driver). On
CPU we verify: the exported artifact set is self-consistent, the StableHLO
round-trips through jax.export and reproduces the in-process infer output,
and the C++ binary's native text encoder (--encode-only, no PJRT needed)
matches the Python frontend id-for-id. Full PJRT execution is exercised on
the real chip (scripts/run_native_infer_demo.sh)."""

import os
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "build-csrc", "ttsrt_infer")

pytestmark = pytest.mark.skipif(
    not os.path.exists(BIN), reason="ttsrt_infer not built (scripts/build_native.sh)"
)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Tiny-config export (fast to trace on CPU)."""
    import yaml

    tmp = tmp_path_factory.mktemp("native_infer")
    cfg_dict = {
        "data": {
            "text_cleaners": ["basic_cleaners"], "add_blank": True,
            "sampling_rate": 8000, "filter_length": 128, "hop_length": 64,
            "win_length": 128, "n_mel_channels": 20,
        },
        "model": {
            "inter_channels": 16, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
            "resblock": "2", "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]], "upsample_rates": [8, 8],
            "upsample_initial_channel": 32, "upsample_kernel_sizes": [16, 16],
            "segment_size": 256,
        },
    }
    cfg_path = str(tmp / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    out = str(tmp / "artifacts")
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_infer_artifacts import build

    build(out, cfg_path, None, pad_text=32, max_frames=48)
    return out, cfg_path


def test_artifact_set_complete(artifacts):
    out, _ = artifacts
    for name in ("infer.mlir", "infer.copts", "params.ttsb", "symbols.txt",
                 "meta.txt"):
        assert os.path.getsize(os.path.join(out, name)) > 0, name
    meta = dict(l.strip().split("=", 1)
                for l in open(os.path.join(out, "meta.txt")))
    assert meta["pad_text"] == "32" and meta["add_blank"] == "1"
    from torch_tts_tpu.infer.artifacts import read_ttsb

    params = read_ttsb(os.path.join(out, "params.ttsb"))
    assert len(params) == int(meta["n_params"])


def test_export_ingests_checkpoint(artifacts, tmp_path):
    """--model-dir exports the CHECKPOINT's weights, not fresh ones: the
    params.ttsb leaves must match the saved tree exactly."""
    out, cfg_path = artifacts
    from export_infer_artifacts import build

    from torch_tts_tpu.infer.artifacts import read_ttsb
    from torch_tts_tpu.train import checkpoint as ckpt

    base = read_ttsb(os.path.join(out, "params.ttsb"))
    # a checkpoint whose params differ recognizably from the host-random init
    import yaml

    from torch_tts_tpu.core.config import load_vits2_config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.train.vits2_trainer import build_models

    cfg = load_vits2_config(cfg_path)
    model, _, _ = build_models(cfg)
    rngs = {"params": jax.random.PRNGKey(5), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, jnp.zeros((1, 8), jnp.int32),
                           jnp.asarray([8], jnp.int32), max_frames=16,
                           method=SynthesizerTrn.infer)
    params = jax.tree.map(lambda a: a + 1.0, variables["params"])
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    ckpt.save_checkpoint(run_dir, 100, {"params_g": jax.device_get(params)})

    out2 = str(tmp_path / "artifacts2")
    build(out2, cfg_path, run_dir, pad_text=32, max_frames=48)
    got = read_ttsb(os.path.join(out2, "params.ttsb"))
    want = jax.tree_util.tree_flatten(params)[0]
    assert len(got) == len(want)
    changed = 0
    for g, w, b in zip(got, want, base):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        changed += int(not np.array_equal(np.asarray(g), np.asarray(b)))
    assert changed > 0  # actually different weights than the random export


def test_native_text_encoder_matches_python(artifacts):
    """--encode-only runs the C++ cleaner + symbol lookup + blank
    interspersal with no PJRT; ids must match the Python frontend exactly
    (this is what makes the native WAVs comparable to Python's)."""
    out, _ = artifacts
    from torch_tts_tpu.text import intersperse, text_to_sequence

    for text in (
        "Hello   World!",
        "MiXeD Case, punct; and-dash.",
        "  leading and trailing  ",
        "tabs\tand\nnewlines",
        "digits 123 pass through?",
    ):
        r = subprocess.run([BIN, out, "--encode-only", "--text", text],
                           capture_output=True, text=True, timeout=60)
        assert r.returncode == 0, r.stderr
        got = [int(t) for t in r.stdout.split()]
        want = intersperse(text_to_sequence(text, ["basic_cleaners"]), 0)
        assert got == want, (text, got, want)


def test_exported_mlir_reproduces_infer(artifacts):
    """Deserialize the exported StableHLO via jax.export and run it with the
    exported params: output must match an in-process jitted infer bitwise
    (same program, same weights, same seed path)."""
    out, cfg_path = artifacts
    from jax import export as jexport

    from torch_tts_tpu.core.config import load_vits2_config
    from torch_tts_tpu.infer.artifacts import read_ttsb
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.train.vits2_trainer import build_models

    with open(os.path.join(out, "infer.jaxexp"), "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    leaves = [jnp.asarray(p) for p in read_ttsb(os.path.join(out, "params.ttsb"))]

    x = np.zeros((1, 32), np.int32)
    x[0, :7] = [1, 30, 1, 30, 1, 30, 1]
    xl = np.asarray([7], np.int32)
    scales = np.asarray([0.667, 1.0, 0.8], np.float32)
    seed = np.asarray([7], np.int32)
    audio, y_len = exported.call(*leaves, x, xl, scales, seed)

    # in-process reference: same params tree, same static shapes
    cfg = load_vits2_config(cfg_path)
    model, _, _ = build_models(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    shapes = jax.eval_shape(lambda: model.init(
        rngs, jnp.asarray(x), jnp.asarray(xl), max_frames=48,
        method=SynthesizerTrn.infer))
    treedef = jax.tree_util.tree_structure(shapes["params"])
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    @jax.jit
    def ref(params, x, xl, scales, seed):
        a, _attn, _m, _aux, yl = model.apply(
            {"params": params}, x, xl,
            noise_scale=scales[0], length_scale=scales[1],
            noise_scale_w=scales[2], max_frames=48,
            method=SynthesizerTrn.infer,
            rngs={"noise": jax.random.PRNGKey(seed[0])},
        )
        return a, yl

    a2, yl2 = ref(params, jnp.asarray(x), jnp.asarray(xl),
                  jnp.asarray(scales), jnp.asarray(seed))
    assert int(y_len[0]) == int(yl2[0]) > 0
    np.testing.assert_allclose(np.asarray(audio), np.asarray(a2), atol=1e-5)
