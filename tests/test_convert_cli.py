"""Round-trip test for the checkpoint converter CLI
(cli/convert_checkpoint.py): a reference-format G_*.pth / D_*.pth pair
imports into a run-dir msgpack whose parameters match tensor-for-tensor, and
exports back to .pth files identical to the originals.

The torch-side files are produced with the (oracle-parity-tested) exporters,
so this exercises exactly the file format the reference's utils.save_checkpoint
writes (vits2/utils.py:48-66: {model, iteration, learning_rate, optimizer})."""

import dataclasses
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_vits2_train_step import tiny_config
from torch_tts_tpu.cli import convert_checkpoint as cc
from torch_tts_tpu.models.vits2 import MultiPeriodDiscriminator, SynthesizerTrn
from torch_tts_tpu.models.vits2.convert import (
    export_mpd_torch_state_dict,
    export_torch_state_dict,
)
from torch_tts_tpu.text import symbols

TINY_YAML = """
model:
  inter_channels: 16
  hidden_channels: 16
  filter_channels: 32
  n_heads: 2
  n_layers: 1
  kernel_size: 3
  p_dropout: 0.1
  resblock: "2"
  resblock_kernel_sizes: [3]
  resblock_dilation_sizes: [[1, 3]]
  upsample_rates: [8, 8]
  upsample_initial_channel: 32
  upsample_kernel_sizes: [16, 16]
  use_sdp: true
  use_transformer_flows: true
  transformer_flow_type: "pre_conv"
  segment_size: 256
  use_noise_scaled_mas: true
data:
  sampling_rate: 8000
  filter_length: 128
  hop_length: 64
  win_length: 128
  n_mel_channels: 20
"""


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


def test_convert_cli_roundtrip(tmp_path, rng, monkeypatch):
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)

    from torch_tts_tpu.core.config import load_vits2_config

    cfg = load_vits2_config(str(cfg_path))
    assert cfg.model.hidden_channels == 16 and cfg.audio.hop_length == 64

    model = SynthesizerTrn(
        n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    mpd = MultiPeriodDiscriminator()
    x = jnp.asarray(rng.integers(1, len(symbols), (1, 9)), jnp.int32)
    xl = jnp.full((1,), 9, jnp.int32)
    spec = jnp.asarray(rng.standard_normal((1, 20, cfg.posterior_channels)),
                       jnp.float32)
    sl = jnp.full((1,), 20, jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params_g = jax.device_get(model.init(rngs, x, xl, spec, sl)["params"])
    seg = cfg.model.segment_size
    params_d = jax.device_get(mpd.init(
        {"params": jax.random.PRNGKey(3)},
        jnp.zeros((1, seg, 1)), jnp.zeros((1, seg, 1)))["params"])

    # write reference-format .pth files
    sd_g = export_torch_state_dict(params_g, cfg.model)
    g_pth = tmp_path / "G_77.pth"
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd_g.items()},
                "iteration": 77, "learning_rate": 2e-4, "optimizer": None},
               g_pth)
    sd_d = export_mpd_torch_state_dict(params_d)
    d_pth = tmp_path / "D_77.pth"
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd_d.items()},
                "iteration": 77, "learning_rate": 2e-4, "optimizer": None},
               d_pth)

    # ---- torch -> ours ----
    run_dir = tmp_path / "imported"
    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoint", "--model", "vits2", "-c", str(cfg_path),
        "--from-torch", str(g_pth), "--mpd", str(d_pth),
        "-o", str(run_dir),
    ])
    cc.main()
    ck = run_dir / "ckpt_77.msgpack"
    assert ck.exists()

    from torch_tts_tpu.train import checkpoint as ckpt

    loaded = ckpt.restore_checkpoint(
        str(ck), {"step": np.zeros((), np.int32), "params_g": params_g,
                  "params_d": params_d},
    )
    assert int(loaded["step"]) == 77
    _tree_equal(loaded["params_g"], params_g)
    _tree_equal(loaded["params_d"], params_d)

    # ---- ours -> torch ----
    out_dir = tmp_path / "exported"
    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoint", "--model", "vits2", "-c", str(cfg_path),
        "--to-torch", str(ck), "-o", str(out_dir),
    ])
    cc.main()
    blob = torch.load(out_dir / "G_77.pth", map_location="cpu",
                      weights_only=False)
    assert blob["iteration"] == 77
    back = {k: v.numpy() for k, v in blob["model"].items()}
    assert set(back) == set(sd_g)
    for k in sd_g:
        np.testing.assert_array_equal(back[k], sd_g[k], err_msg=k)
    blob_d = torch.load(out_dir / "D_77.pth", map_location="cpu",
                        weights_only=False)
    back_d = {k: v.numpy() for k, v in blob_d["model"].items()}
    for k in sd_d:
        np.testing.assert_array_equal(back_d[k], sd_d[k], err_msg=k)
