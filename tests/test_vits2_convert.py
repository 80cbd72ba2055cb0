"""Checkpoint converter: round-trip (flax params -> torch-format state_dict ->
flax params) must be the identity, the report must be clean (every torch key
consumed, every flax leaf filled), and emitted names must follow the
reference's state_dict conventions (spot-checked against known names from
/root/reference/vits2/models.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.core.config import VITS2ModelConfig
from torch_tts_tpu.models.vits2 import SynthesizerTrn
from torch_tts_tpu.models.vits2.convert import (
    convert_synthesizer,
    export_torch_state_dict,
)

TINY = VITS2ModelConfig(
    inter_channels=8,
    hidden_channels=8,
    filter_channels=16,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3), (1, 3)),
    upsample_rates=(4, 2),
    upsample_initial_channel=16,
    upsample_kernel_sizes=(8, 4),
    use_sdp=True,
    use_transformer_flows=True,
    transformer_flow_type="pre_conv",
    segment_size=8 * 8,
)


def init_params(cfg):
    model = SynthesizerTrn(n_vocab=20, spec_channels=12, segment_frames=4, cfg=cfg)
    x = jnp.asarray([[1, 2, 3, 4, 5]])
    xl = jnp.asarray([5])
    y = jnp.zeros((1, 16, 12))
    yl = jnp.asarray([16])
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    sid = jnp.asarray([0]) if cfg.n_speakers > 1 else None
    return model, model.init(rngs, x, xl, y, yl, sid=sid)["params"]


def tree_leaves_with_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(tree_leaves_with_paths(v, p))
        else:
            out[p] = np.asarray(v)
    return out


@pytest.mark.parametrize("flow_type", ["pre_conv", "mono_layer_post_residual"])
@pytest.mark.parametrize("use_sdp", [True, False])
def test_roundtrip_identity(flow_type, use_sdp):
    cfg = dataclasses.replace(TINY, transformer_flow_type=flow_type, use_sdp=use_sdp)
    model, params = init_params(cfg)
    params = jax.device_get(params)

    sd = export_torch_state_dict(params, cfg)
    back, report = convert_synthesizer(sd, cfg)

    assert report["missing"] == [], f"missing: {report['missing'][:10]}"
    assert report["unused"] == [], f"unused: {report['unused'][:10]}"

    a = tree_leaves_with_paths(params)
    b = tree_leaves_with_paths(back)
    assert set(a) == set(b), (
        f"only-ours: {sorted(set(a) - set(b))[:8]}; "
        f"only-converted: {sorted(set(b) - set(a))[:8]}"
    )
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_multispeaker_roundtrip():
    cfg = dataclasses.replace(TINY, n_speakers=3, gin_channels=8)
    model, params = init_params(cfg)
    params = jax.device_get(params)
    sd = export_torch_state_dict(params, cfg)
    assert "emb_g.weight" in sd
    back, report = convert_synthesizer(sd, cfg)
    assert report["missing"] == []
    a = tree_leaves_with_paths(params)
    b = tree_leaves_with_paths(back)
    assert set(a) == set(b)


def test_reference_key_naming():
    """Emitted names must match the reference's torch module tree."""
    cfg = TINY
    model, params = init_params(cfg)
    sd = export_torch_state_dict(jax.device_get(params), cfg)
    expected = [
        "enc_p.emb.weight",
        "enc_p.encoder.attn_layers.0.conv_q.weight",
        "enc_p.encoder.attn_layers.0.emb_rel_k",
        "enc_p.encoder.norm_layers_1.0.gamma",
        "enc_p.encoder.ffn_layers.1.conv_2.bias",
        "enc_p.proj.weight",
        "enc_q.enc.in_layers.0.weight_g",
        "enc_q.enc.in_layers.15.weight_v",
        "enc_q.enc.res_skip_layers.7.weight_g",
        "dec.conv_pre.weight",
        "dec.ups.0.weight_v",
        "dec.ups.1.weight_g",
        "dec.resblocks.0.convs1.0.weight_v",
        "dec.resblocks.3.convs2.1.weight_g",
        "dec.conv_post.weight",
        "dp.flows.0.m",
        "dp.flows.1.pre.weight",
        "dp.flows.1.convs.convs_sep.0.weight",
        "dp.flows.1.convs.norms_1.0.gamma",
        "dp.post_flows.7.proj.weight",
        "flow.flows.0.pre_transformer.attn_layers.0.conv_k.weight",
        "flow.flows.6.enc.in_layers.0.weight_v",
        "flow.flows.2.post.weight",
    ]
    for k in expected:
        assert k in sd, f"missing expected reference key: {k}"

    # torch shape conventions
    assert sd["enc_p.proj.weight"].ndim == 3  # [out, in, 1]
    assert sd["enc_p.proj.weight"].shape[2] == 1
    assert sd["dp.flows.0.m"].shape == (2, 1)
    g = sd["enc_q.enc.in_layers.0.weight_g"]
    assert g.shape == (g.size, 1, 1)
