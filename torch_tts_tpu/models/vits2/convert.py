"""Reference-checkpoint converter: torch VITS2 state_dict -> flax params.

Lets users of the reference (/root/reference/vits2) load their trained
`G_<step>.pth` checkpoints (saved by vits2/utils.py:48-66 as
{model, iteration, optimizer, learning_rate}) into this framework's
SynthesizerTrn.

The converter is *structure-driven*: it walks OUR parameter tree, derives the
corresponding torch key for each leaf from a library of name/layout rules
(documented per sub-network below, with reference file:line anchors), fetches
it from the state_dict, and transposes torch layouts into channels-last:

  Conv1d   weight [out, in, k]     -> kernel [k, in, out]        (transpose 2,1,0)
  ConvT1d  weight [in, out, k]     -> kernel [k, out, in]        (transpose 2,1,0)
  Conv2d   weight [out, in, kh, kw]-> kernel [kh, kw, in, out]   (transpose 2,3,1,0)
  Linear   weight [out, in]        -> kernel [in, out]           (transpose)
  weight_norm (g, v) pairs map to our (g [out], v [same-as-kernel]) params
  LayerNorm gamma/beta -> scale/bias;  Embedding weight -> embedding
  ElementwiseAffine m/logs [C, 1] -> [C]

Every converted tensor is shape-checked; unmatched torch keys and unfilled
flax leaves are reported so partial/drifted checkpoints fail loudly (or
leniently, matching vits2/utils.py:31-41, when strict=False).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _t(x) -> np.ndarray:
    return np.asarray(x)


def conv1d_w(w):  # [out, in, k] -> [k, in, out]
    return _t(w).transpose(2, 1, 0)


def convt1d_w(w):  # [in, out, k] -> [k, out, in]
    return _t(w).transpose(2, 1, 0)


def conv2d_w(w):  # [out, in, kh, kw] -> [kh, kw, in, out]
    return _t(w).transpose(2, 3, 1, 0)


def linear_w(w):  # [out, in] -> [in, out]
    return _t(w).transpose(1, 0)


class Converter:
    def __init__(self, state_dict: Dict[str, Any]):
        # strip DDP "module." prefixes
        self.sd = {re.sub(r"^module\.", "", k): _t(v) for k, v in state_dict.items()}
        self.used: set = set()
        self.missing: List[str] = []

    def take(self, key: str, fn=None, default_shape=None):
        if key not in self.sd:
            self.missing.append(key)
            return None
        self.used.add(key)
        v = self.sd[key]
        return fn(v) if fn else v

    def unused_keys(self) -> List[str]:
        return [k for k in self.sd if k not in self.used]


def _convert_conv1d(cv: Converter, tkey: str, out: Dict, weight_norm=False,
                    bias=True):
    if weight_norm:
        g = cv.take(f"{tkey}.weight_g")
        v = cv.take(f"{tkey}.weight_v", conv1d_w)
        if g is not None:
            out["g"] = g.reshape(-1)
        if v is not None:
            out["v"] = v
    else:
        w = cv.take(f"{tkey}.weight", conv1d_w)
        if w is not None:
            out["kernel"] = w
    if bias:
        b = cv.take(f"{tkey}.bias")
        if b is not None:
            out["bias"] = b
    return out


def _convert_layernorm(cv: Converter, tkey: str) -> Dict:
    out = {}
    g = cv.take(f"{tkey}.gamma")
    b = cv.take(f"{tkey}.beta")
    if g is not None:
        out["scale"] = g
    if b is not None:
        out["bias"] = b
    return out


def _convert_ddsconv(cv: Converter, tkey: str, n_layers: int) -> Dict:
    out = {}
    for i in range(n_layers):
        out[f"sep_{i}"] = _convert_conv1d(cv, f"{tkey}.convs_sep.{i}", {})
        out[f"pw_{i}"] = _convert_conv1d(cv, f"{tkey}.convs_1x1.{i}", {})
        out[f"norm1_{i}"] = _convert_layernorm(cv, f"{tkey}.norms_1.{i}")
        out[f"norm2_{i}"] = _convert_layernorm(cv, f"{tkey}.norms_2.{i}")
    return out


def _convert_wn(cv: Converter, tkey: str, n_layers: int, has_cond: bool) -> Dict:
    out = {}
    if has_cond and f"{tkey}.cond_layer.weight_g" in cv.sd:
        out["cond_layer"] = _convert_conv1d(cv, f"{tkey}.cond_layer", {},
                                            weight_norm=True)
    for i in range(n_layers):
        out[f"in_{i}"] = _convert_conv1d(cv, f"{tkey}.in_layers.{i}", {},
                                         weight_norm=True)
        out[f"res_skip_{i}"] = _convert_conv1d(cv, f"{tkey}.res_skip_layers.{i}", {},
                                               weight_norm=True)
    return out


def _convert_ffn(cv: Converter, tkey: str) -> Dict:
    return {
        "conv_1": _convert_conv1d(cv, f"{tkey}.conv_1", {}),
        "conv_2": _convert_conv1d(cv, f"{tkey}.conv_2", {}),
    }


def _convert_mha(cv: Converter, tkey: str) -> Dict:
    out = {}
    for name in ("conv_q", "conv_k", "conv_v", "conv_o"):
        out[name] = _convert_conv1d(cv, f"{tkey}.{name}", {})
    for name in ("emb_rel_k", "emb_rel_v"):
        # only present when window_size is set (absent in windowless
        # flow-internal transformers, models.py:472-480)
        if f"{tkey}.{name}" in cv.sd:
            out[name] = cv.take(f"{tkey}.{name}")
    return out


def _convert_encoder(cv: Converter, tkey: str, n_layers: int,
                     has_spk: bool = False) -> Dict:
    out = {}
    for i in range(n_layers):
        out[f"attn_{i}"] = _convert_mha(cv, f"{tkey}.attn_layers.{i}")
        out[f"norm1_{i}"] = _convert_layernorm(cv, f"{tkey}.norm_layers_1.{i}")
        out[f"ffn_{i}"] = _convert_ffn(cv, f"{tkey}.ffn_layers.{i}")
        out[f"norm2_{i}"] = _convert_layernorm(cv, f"{tkey}.norm_layers_2.{i}")
    if has_spk and f"{tkey}.spk_emb_linear.weight" in cv.sd:
        out["spk_emb_linear"] = {
            "kernel": cv.take(f"{tkey}.spk_emb_linear.weight", linear_w),
            "bias": cv.take(f"{tkey}.spk_emb_linear.bias"),
        }
    return out


def _convert_convflow(cv: Converter, tkey: str) -> Dict:
    return {
        "pre": _convert_conv1d(cv, f"{tkey}.pre", {}),
        "convs": _convert_ddsconv(cv, f"{tkey}.convs", 3),
        "proj": _convert_conv1d(cv, f"{tkey}.proj", {}),
    }


def _convert_elementwise_affine(cv: Converter, tkey: str) -> Dict:
    return {
        "m": cv.take(f"{tkey}.m", lambda v: _t(v).reshape(-1)),
        "logs": cv.take(f"{tkey}.logs", lambda v: _t(v).reshape(-1)),
    }


def _convert_sdp(cv: Converter, tkey: str) -> Dict:
    """StochasticDurationPredictor (models.py:29-137). Flow lists interleave
    ConvFlow/Flip; Flips are param-free so our flows_{2i+1} have no entry."""
    out = {
        "pre": _convert_conv1d(cv, f"{tkey}.pre", {}),
        "proj": _convert_conv1d(cv, f"{tkey}.proj", {}),
        "convs": _convert_ddsconv(cv, f"{tkey}.convs", 3),
        "post_pre": _convert_conv1d(cv, f"{tkey}.post_pre", {}),
        "post_proj": _convert_conv1d(cv, f"{tkey}.post_proj", {}),
        "post_convs": _convert_ddsconv(cv, f"{tkey}.post_convs", 3),
        "flows_0": _convert_elementwise_affine(cv, f"{tkey}.flows.0"),
        "post_flows_0": _convert_elementwise_affine(cv, f"{tkey}.post_flows.0"),
    }
    # torch flows: [EA, CF, Flip, CF, Flip, ...] — ConvFlows at odd indices
    for i in range(4):
        out[f"flows_{2 * i + 1}"] = _convert_convflow(cv, f"{tkey}.flows.{2 * i + 1}")
        out[f"post_flows_{2 * i + 1}"] = _convert_convflow(
            cv, f"{tkey}.post_flows.{2 * i + 1}"
        )
    if f"{tkey}.cond.weight" in cv.sd:
        out["cond"] = _convert_conv1d(cv, f"{tkey}.cond", {})
    return out


def _convert_dp(cv: Converter, tkey: str) -> Dict:
    out = {
        "conv_1": _convert_conv1d(cv, f"{tkey}.conv_1", {}),
        "norm_1": _convert_layernorm(cv, f"{tkey}.norm_1"),
        "conv_2": _convert_conv1d(cv, f"{tkey}.conv_2", {}),
        "norm_2": _convert_layernorm(cv, f"{tkey}.norm_2"),
        "proj": _convert_conv1d(cv, f"{tkey}.proj", {}),
    }
    if f"{tkey}.cond.weight" in cv.sd:
        out["cond"] = _convert_conv1d(cv, f"{tkey}.cond", {})
    return out


def _convert_coupling(cv: Converter, tkey: str, kind: str, wn_layers: int = 4) -> Dict:
    """kind: plain | pre_conv | pre_conv2 | fft | mono."""
    out = {}
    if kind in ("plain", "pre_conv", "pre_conv2"):
        out["pre"] = _convert_conv1d(cv, f"{tkey}.pre", {})
        out["enc"] = _convert_wn(cv, f"{tkey}.enc", wn_layers, has_cond=True)
        out["post"] = _convert_conv1d(cv, f"{tkey}.post", {})
    if kind == "pre_conv":
        out["pre_transformer"] = _convert_encoder(cv, f"{tkey}.pre_transformer", 2)
        # the reference also declares a post_transformer whose forward use is
        # commented out (models.py:492-515); its params exist in checkpoints
        # but are dead weight — consume them silently
        for k in list(cv.sd):
            if k.startswith(f"{tkey}.post_transformer."):
                cv.used.add(k)
    if kind == "pre_conv2":
        out["pre_transformer"] = _convert_encoder(cv, f"{tkey}.pre_transformer", 1)
    if kind == "fft":
        out["pre"] = _convert_conv1d(cv, f"{tkey}.pre", {})
        out["post"] = _convert_conv1d(cv, f"{tkey}.post", {})
        enc = {}
        for i in range(1):  # effective n_layers = 1 (see FlowBlock fft note)
            enc[f"self_attn_{i}"] = _convert_mha(cv, f"{tkey}.enc.self_attn_layers.{i}")
            enc[f"norm0_{i}"] = _convert_layernorm(cv, f"{tkey}.enc.norm_layers_0.{i}")
            enc[f"ffn_{i}"] = _convert_ffn(cv, f"{tkey}.enc.ffn_layers.{i}")
            enc[f"norm1_{i}"] = _convert_layernorm(cv, f"{tkey}.enc.norm_layers_1.{i}")
        if f"{tkey}.enc.cond_layer.weight_g" in cv.sd:
            enc["cond_layer"] = _convert_conv1d(cv, f"{tkey}.enc.cond_layer", {},
                                                weight_norm=True)
            enc["cond_pre"] = _convert_conv1d(cv, f"{tkey}.enc.cond_pre", {})
        out["enc"] = enc
    if kind == "mono":
        out["pre_transformer"] = _convert_encoder(cv, f"{tkey}.pre_transformer", 2)
        out["post"] = _convert_conv1d(cv, f"{tkey}.post", {})
    return out


def _convert_flow_block(cv: Converter, tkey: str, cfg) -> Dict:
    out = {}
    if not cfg.use_transformer_flows:
        for i in range(4):
            out[f"flows_{2 * i}"] = _convert_coupling(cv, f"{tkey}.flows.{2 * i}",
                                                      "plain")
        return out
    t = cfg.transformer_flow_type
    if t in ("pre_conv", "pre_conv2", "fft"):
        for i in range(4):
            out[f"flows_{2 * i}"] = _convert_coupling(
                cv, f"{tkey}.flows.{2 * i}", t
            )
    else:  # mono_layer_*: triplets [coupling, flip, mono]
        for i in range(4):
            out[f"flows_{3 * i}"] = _convert_coupling(cv, f"{tkey}.flows.{3 * i}",
                                                      "plain")
            out[f"flows_{3 * i + 2}"] = _convert_coupling(
                cv, f"{tkey}.flows.{3 * i + 2}", "mono"
            )
    return out


def _convert_generator(cv: Converter, tkey: str, cfg) -> Dict:
    out = {
        "conv_pre": _convert_conv1d(cv, f"{tkey}.conv_pre", {}),
        "conv_post": _convert_conv1d(cv, f"{tkey}.conv_post", {}, bias=False),
    }
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        up = {}
        g = cv.take(f"{tkey}.ups.{i}.weight_g")
        v = cv.take(f"{tkey}.ups.{i}.weight_v", convt1d_w)
        b = cv.take(f"{tkey}.ups.{i}.bias")
        if g is not None:
            up["g"] = g.reshape(-1)
        if v is not None:
            up["v"] = v
        if b is not None:
            up["bias"] = b
        out[f"up_{i}"] = up
        for j in range(n_k):
            ridx = i * n_k + j
            rb = {}
            n_dil = len(cfg.resblock_dilation_sizes[j])
            if cfg.resblock == "1":
                for d in range(n_dil):
                    rb[f"conv1_{d}"] = _convert_conv1d(
                        cv, f"{tkey}.resblocks.{ridx}.convs1.{d}", {}, weight_norm=True
                    )
                    rb[f"conv2_{d}"] = _convert_conv1d(
                        cv, f"{tkey}.resblocks.{ridx}.convs2.{d}", {}, weight_norm=True
                    )
            else:
                for d in range(n_dil):
                    rb[f"conv_{d}"] = _convert_conv1d(
                        cv, f"{tkey}.resblocks.{ridx}.convs.{d}", {}, weight_norm=True
                    )
            out[f"resblock_{i}_{j}"] = rb
    if f"{tkey}.cond.weight" in cv.sd:
        out["cond"] = _convert_conv1d(cv, f"{tkey}.cond", {})
    return out


def convert_synthesizer(state_dict: Dict[str, Any], cfg) -> Tuple[Dict, Dict]:
    """torch SynthesizerTrn state_dict + VITS2ModelConfig -> (flax params,
    report). Report lists missing torch keys and unused torch keys."""
    cv = Converter(state_dict)
    params: Dict[str, Any] = {}

    # enc_p: TextEncoder (models.py:332-380)
    enc_p = {
        "emb": {"embedding": cv.take("enc_p.emb.weight")},
        "encoder": _convert_encoder(cv, "enc_p.encoder", cfg.n_layers, has_spk=True),
        "proj": _convert_conv1d(cv, "enc_p.proj", {}),
    }
    params["enc_p"] = enc_p

    # enc_q: PosteriorEncoder (models.py:858-897): WN 16 layers
    params["enc_q"] = {
        "pre": _convert_conv1d(cv, "enc_q.pre", {}),
        "enc": _convert_wn(cv, "enc_q.enc", 16, has_cond=True),
        "proj": _convert_conv1d(cv, "enc_q.proj", {}),
    }

    params["flow"] = _convert_flow_block(cv, "flow", cfg)
    params["dec"] = _convert_generator(cv, "dec", cfg)
    params["dp"] = (
        _convert_sdp(cv, "dp") if cfg.use_sdp else _convert_dp(cv, "dp")
    )
    if "emb_g.weight" in cv.sd:
        params["emb_g"] = {"embedding": cv.take("emb_g.weight")}

    report = {"missing": cv.missing, "unused": cv.unused_keys()}
    if report["missing"]:
        logger.warning("converter: %d torch keys missing (e.g. %s)",
                       len(report["missing"]), report["missing"][:5])
    if report["unused"]:
        logger.warning("converter: %d torch keys unused (e.g. %s)",
                       len(report["unused"]), report["unused"][:5])
    return params, report


def _prune_none(tree):
    if isinstance(tree, dict):
        out = {k: _prune_none(v) for k, v in tree.items()}
        return {
            k: v for k, v in out.items()
            if v is not None and not (isinstance(v, dict) and not v)
        }
    return tree


def convert_mpd(state_dict: Dict[str, Any], periods=(2, 3, 5, 7, 11)) -> Tuple[Dict, Dict]:
    """torch MultiPeriodDiscriminator state_dict -> flax params
    (models.py:977-1110). Handles weight-norm conv1d (DiscriminatorS) and
    conv2d (DiscriminatorP) layouts; spectral-norm checkpoints store
    weight_orig/u which are mapped onto the kernel directly."""
    cv = Converter(state_dict)
    params: Dict[str, Any] = {}

    def conv_any(tkey: str, is2d: bool) -> Dict:
        out: Dict[str, Any] = {}
        tr = conv2d_w if is2d else conv1d_w
        if f"{tkey}.weight_g" in cv.sd:
            out["g"] = cv.take(f"{tkey}.weight_g").reshape(-1)
            out["v"] = cv.take(f"{tkey}.weight_v", tr)
        elif f"{tkey}.weight_orig" in cv.sd:  # spectral norm
            out["kernel"] = cv.take(f"{tkey}.weight_orig", tr)
            if f"{tkey}.weight_u" in cv.sd:
                cv.used.add(f"{tkey}.weight_u")  # power-iter state: re-estimated
            if f"{tkey}.weight_v" in cv.sd:
                cv.used.add(f"{tkey}.weight_v")
        else:
            out["kernel"] = cv.take(f"{tkey}.weight", tr)
        b = cv.take(f"{tkey}.bias")
        if b is not None:
            out["bias"] = b
        return out

    # discriminators.0 = DiscriminatorS (6 conv1d + conv_post)
    s = {}
    for j in range(6):
        s[f"conv_{j}"] = conv_any(f"discriminators.0.convs.{j}", is2d=False)
    s["conv_post"] = conv_any("discriminators.0.conv_post", is2d=False)
    params["disc_s"] = s

    for i, p in enumerate(periods, start=1):
        d = {}
        for j in range(5):
            d[f"conv_{j}"] = conv_any(f"discriminators.{i}.convs.{j}", is2d=True)
        d["conv_post"] = conv_any(f"discriminators.{i}.conv_post", is2d=True)
        params[f"disc_p{p}"] = d

    report = {"missing": cv.missing, "unused": cv.unused_keys()}
    return params, report


def export_mpd_torch_state_dict(params: Dict[str, Any],
                                periods=(2, 3, 5, 7, 11)) -> Dict[str, np.ndarray]:
    """Inverse: flax MPD params -> reference-format torch state_dict."""
    out: Dict[str, np.ndarray] = {}

    def emit(tkey: str, tree: Dict, is2d: bool):
        if "v" in tree:
            v = _t(tree["v"])
            inv = v.transpose(3, 2, 0, 1) if is2d else v.transpose(2, 1, 0)
            out[f"{tkey}.weight_v"] = inv
            g = _t(tree["g"])
            gshape = (-1, 1, 1, 1) if is2d else (-1, 1, 1)
            out[f"{tkey}.weight_g"] = g.reshape(gshape)
        else:
            k = _t(tree["kernel"])
            out[f"{tkey}.weight"] = (
                k.transpose(3, 2, 0, 1) if is2d else k.transpose(2, 1, 0)
            )
        if "bias" in tree:
            out[f"{tkey}.bias"] = _t(tree["bias"])

    s = params["disc_s"]
    for j in range(6):
        emit(f"discriminators.0.convs.{j}", s[f"conv_{j}"], is2d=False)
    emit("discriminators.0.conv_post", s["conv_post"], is2d=False)
    for i, p in enumerate(periods, start=1):
        d = params[f"disc_p{p}"]
        for j in range(5):
            emit(f"discriminators.{i}.convs.{j}", d[f"conv_{j}"], is2d=True)
        emit(f"discriminators.{i}.conv_post", d["conv_post"], is2d=True)
    return out


def export_dur_disc_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flax DurationDiscriminatorV1 params -> reference torch state_dict
    (/root/reference/vits2/models.py:183-257).

    The torch module also instantiates pre_out_norm_1/2 LayerNorms that its
    forward never uses (commented out at models.py:227-231,235-239); they have
    no flax counterpart, so a `load_state_dict(strict=False)` will report
    exactly {pre_out_norm_1,pre_out_norm_2}.{gamma,beta} missing — harmless.
    """
    out: Dict[str, np.ndarray] = {}
    for name in ("conv_1", "conv_2", "dur_proj", "pre_out_conv_1",
                 "pre_out_conv_2"):
        t = params[name]
        out[f"{name}.weight"] = _t(t["kernel"]).transpose(2, 1, 0)
        out[f"{name}.bias"] = _t(t["bias"])
    # torch: nn.Sequential(nn.Linear, nn.Sigmoid) -> keys output_layer.0.*
    out["output_layer.0.weight"] = _t(params["output_layer"]["kernel"]).T
    out["output_layer.0.bias"] = _t(params["output_layer"]["bias"])
    return out


def export_torch_state_dict(params: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    """Inverse direction: flax params -> reference-format torch state_dict
    (so models trained here can be consumed by reference tooling). Walks the
    param tree and emits torch names/layouts; together with
    `convert_synthesizer` this forms a round-trip used by the tests."""
    out: Dict[str, np.ndarray] = {}

    def conv1d_inv(k):  # [k, in, out] -> [out, in, k]
        return _t(k).transpose(2, 1, 0)

    def convt1d_inv(k):  # [k, out, in] -> [in, out, k]
        return _t(k).transpose(2, 1, 0)

    def walk(tree, fpath: List[str]):
        if not isinstance(tree, dict):
            return
        keys = set(tree.keys())
        tname = _flax_to_torch_path(fpath)
        if {"v", "g"} <= keys:  # weight-normed conv
            inv = convt1d_inv if fpath and fpath[-1].startswith("up_") else conv1d_inv
            gshape = (-1, 1, 1)
            out[f"{tname}.weight_v"] = inv(tree["v"])
            out[f"{tname}.weight_g"] = _t(tree["g"]).reshape(gshape)
            if "bias" in keys:
                out[f"{tname}.bias"] = _t(tree["bias"])
            return
        if "kernel" in keys:
            k = _t(tree["kernel"])
            if k.ndim == 3:
                out[f"{tname}.weight"] = conv1d_inv(k)
            elif k.ndim == 2:
                out[f"{tname}.weight"] = linear_w(k)  # transpose is its own inverse
            if "bias" in keys:
                out[f"{tname}.bias"] = _t(tree["bias"])
            return
        if {"scale", "bias"} == keys:  # LayerNorm
            out[f"{tname}.gamma"] = _t(tree["scale"])
            out[f"{tname}.beta"] = _t(tree["bias"])
            return
        if "embedding" in keys:
            out[f"{tname}.weight"] = _t(tree["embedding"])
            return
        if {"m", "logs"} == keys:  # ElementwiseAffine
            out[f"{tname}.m"] = _t(tree["m"]).reshape(-1, 1)
            out[f"{tname}.logs"] = _t(tree["logs"]).reshape(-1, 1)
            return
        for k in sorted(keys):
            v = tree[k]
            if isinstance(v, dict):
                walk(v, fpath + [k])
            else:
                # bare leaf params (emb_rel_k/v etc.): same name, same layout
                out[_flax_to_torch_path(fpath + [k])] = _t(v)

    walk(params, [])

    # vestigial post_transformer of the pre_conv flow layers (models.py:492-500):
    # the reference's state_dict contains these never-used params; emit
    # identity-initialized placeholders so strict loads into reference
    # modules succeed.
    if getattr(cfg, "use_transformer_flows", False) and (
        getattr(cfg, "transformer_flow_type", "") == "pre_conv"
    ):
        h = cfg.hidden_channels
        for fi in range(4):
            p = f"flow.flows.{2 * fi}.post_transformer"
            for li in range(2):
                a = f"{p}.attn_layers.{li}"
                for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
                    out[f"{a}.{nm}.weight"] = np.zeros((h, h, 1), np.float32)
                    out[f"{a}.{nm}.bias"] = np.zeros((h,), np.float32)
                out[f"{p}.norm_layers_1.{li}.gamma"] = np.ones((h,), np.float32)
                out[f"{p}.norm_layers_1.{li}.beta"] = np.zeros((h,), np.float32)
                f = f"{p}.ffn_layers.{li}"
                out[f"{f}.conv_1.weight"] = np.zeros((h, h, 3), np.float32)
                out[f"{f}.conv_1.bias"] = np.zeros((h,), np.float32)
                out[f"{f}.conv_2.weight"] = np.zeros((h, h, 3), np.float32)
                out[f"{f}.conv_2.bias"] = np.zeros((h,), np.float32)
                out[f"{p}.norm_layers_2.{li}.gamma"] = np.ones((h,), np.float32)
                out[f"{p}.norm_layers_2.{li}.beta"] = np.zeros((h,), np.float32)

    # resblock_{i}_{j} -> resblocks.{i * num_kernels + j}
    n_k = len(cfg.resblock_kernel_sizes)
    fixed = {}
    for k, v in out.items():
        m = re.search(r"resblock_(\d+)_(\d+)", k)
        if m:
            idx = int(m.group(1)) * n_k + int(m.group(2))
            k = k.replace(m.group(0), f"resblocks.{idx}")
        fixed[k] = v
    return fixed


def _flax_to_torch_path(fpath: List[str]) -> str:
    """Map our flax module path to the reference torch dotted name."""
    parts: List[str] = []
    in_ddsconv = any(p in ("convs", "post_convs") for p in fpath)
    in_fft_enc = len(fpath) >= 2 and fpath[-2] == "enc" and any(
        p.startswith("self_attn_") or p.startswith("ffn_") for p in fpath[-1:]
    )
    for i, p in enumerate(fpath):
        nxt = None
        m = re.match(r"^attn_(\d+)$", p)
        if m:
            nxt = f"attn_layers.{m.group(1)}"
        elif re.match(r"^self_attn_(\d+)$", p):
            nxt = f"self_attn_layers.{p.split('_')[-1]}"
        elif re.match(r"^ffn_(\d+)$", p):
            nxt = f"ffn_layers.{p.split('_')[-1]}"
        elif re.match(r"^norm0_(\d+)$", p):
            nxt = f"norm_layers_0.{p.split('_')[-1]}"
        elif re.match(r"^norm1_(\d+)$", p):
            # DDSConv uses norms_1/norms_2; transformer blocks norm_layers_1/2
            prev = fpath[i - 1] if i else ""
            if prev in ("convs", "post_convs") or any(
                q.startswith("sep_") for q in fpath
            ):
                nxt = f"norms_1.{p.split('_')[-1]}"
            else:
                nxt = f"norm_layers_1.{p.split('_')[-1]}"
        elif re.match(r"^norm2_(\d+)$", p):
            prev = fpath[i - 1] if i else ""
            if prev in ("convs", "post_convs"):
                nxt = f"norms_2.{p.split('_')[-1]}"
            else:
                nxt = f"norm_layers_2.{p.split('_')[-1]}"
        elif re.match(r"^sep_(\d+)$", p):
            nxt = f"convs_sep.{p.split('_')[-1]}"
        elif re.match(r"^pw_(\d+)$", p):
            nxt = f"convs_1x1.{p.split('_')[-1]}"
        elif re.match(r"^in_(\d+)$", p):
            nxt = f"in_layers.{p.split('_')[-1]}"
        elif re.match(r"^res_skip_(\d+)$", p):
            nxt = f"res_skip_layers.{p.split('_')[-1]}"
        elif re.match(r"^flows_(\d+)$", p):
            nxt = f"flows.{p.split('_')[-1]}"
        elif re.match(r"^post_flows_(\d+)$", p):
            nxt = f"post_flows.{p.split('_')[-1]}"
        elif re.match(r"^up_(\d+)$", p):
            nxt = f"ups.{p.split('_')[-1]}"
        elif re.match(r"^resblock_(\d+)_(\d+)$", p):
            # flattened index: i * num_kernels + j — filled by caller context;
            # num_kernels is recovered from sibling count at export time.
            nxt = p  # placeholder, fixed in _fix_resblock_names
        elif re.match(r"^conv1_(\d+)$", p) and any(
            q.startswith("resblock") for q in fpath[:i]
        ):
            nxt = f"convs1.{p.split('_')[-1]}"
        elif re.match(r"^conv2_(\d+)$", p) and any(
            q.startswith("resblock") for q in fpath[:i]
        ):
            nxt = f"convs2.{p.split('_')[-1]}"
        elif re.match(r"^conv_(\d+)$", p) and any(
            q.startswith("resblock") for q in fpath[:i]
        ):
            nxt = f"convs.{p.split('_')[-1]}"
        else:
            nxt = p
        parts.append(nxt)
    return ".".join(parts)


def load_reference_checkpoint(path: str, cfg, target_params=None):
    """Load a reference G_*.pth (torch.load) and convert. If `target_params`
    is given, converted values are merged into it leniently (missing leaves
    keep their init, mirroring vits2/utils.py:31-41) and shape-checked."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, report = convert_synthesizer(sd, cfg)
    params = _prune_none(params)
    if target_params is None:
        return params, report

    def merge(dst, src, path=""):
        out = {}
        for k, v in dst.items():
            if k in src and isinstance(v, dict):
                out[k] = merge(v, src[k], f"{path}/{k}")
            elif k in src and src[k] is not None:
                sv = np.asarray(src[k])
                if tuple(sv.shape) != tuple(np.shape(v)):
                    logger.warning("shape mismatch at %s/%s: %s vs %s — keeping init",
                                   path, k, sv.shape, np.shape(v))
                    out[k] = v
                else:
                    out[k] = sv.astype(np.asarray(v).dtype)
            else:
                logger.warning("missing %s/%s — keeping init", path, k)
                out[k] = v
        return out

    return merge(target_params, params), report
