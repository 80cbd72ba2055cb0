"""Reference-checkpoint converter for the tacotron stack.

Maps between our flax parameter tree and the reference's torch state_dict
(/root/reference/tacotron: Tacotron{encoder=Encoder2, decoder=Decoder with
Taco2ProdDecoderCell/Taco2DecoderCell, postnet=MelPostnet}) so that
`checkpoint.pt` files (train_util.py:170-207, key 'model_state') can be
loaded here and vice versa.

Covered: Encoder2, the tacotron2/tacotron2prod decoder cells, MelPostnet,
and the VAE reference encoder. Layout rules as in models/vits2/convert.py,
plus torch BatchNorm running stats <-> the flax "batch_stats" collection and
torch LSTM/LSTMCell [4H, in] <-> our [in, 4H] (same i,f,g,o gate order).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t(x):
    return np.asarray(x)


def _lin(w):  # torch Linear [out, in] <-> ours [in, out]
    return _t(w).transpose(1, 0)


def _conv1d(w):  # torch [out, in, k] <-> ours [k, in, out]
    return _t(w).transpose(2, 1, 0)


def export_torch_state_dict(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    cfg,
) -> Dict[str, np.ndarray]:
    """flax (params, batch_stats) + TacotronConfig -> reference state_dict."""
    m = cfg.model
    if m.encoder_type == "tacotron1" or m.decoder_type == "tacotron1":
        raise NotImplementedError("converter covers the tacotron2* variants")
    out: Dict[str, np.ndarray] = {}

    def put_linear(tname, tree):
        out[f"{tname}.weight"] = _lin(tree["kernel"])
        if "bias" in tree:
            out[f"{tname}.bias"] = _t(tree["bias"])

    def put_lstm_cell(tname, tree):
        cell = tree["cell"] if "cell" in tree else tree
        out[f"{tname}.weight_ih"] = _lin(cell["w_ih"])
        out[f"{tname}.weight_hh"] = _lin(cell["w_hh"])
        if "b_ih" in cell:
            out[f"{tname}.bias_ih"] = _t(cell["b_ih"])
            out[f"{tname}.bias_hh"] = _t(cell["b_hh"])

    def put_bn(tname, ptree, stree, affine=True):
        if affine and ptree is not None:
            bn = ptree["BatchNorm_0"]
            out[f"{tname}.weight"] = _t(bn["scale"])
            out[f"{tname}.bias"] = _t(bn["bias"])
        sbn = stree["BatchNorm_0"]
        out[f"{tname}.running_mean"] = _t(sbn["mean"])
        out[f"{tname}.running_var"] = _t(sbn["var"])
        out[f"{tname}.num_batches_tracked"] = np.zeros((), np.int64)

    # ---- encoder (Encoder2; encoder.py:41-82) ----
    enc = params["encoder"]
    enc_bs = batch_stats.get("encoder", {})
    out["encoder.emb.weight"] = _t(enc["emb"]["embedding"])
    for i in range(3):
        out[f"encoder.conv.{3 * i}.weight"] = _conv1d(enc[f"conv_{i}"]["kernel"])
        put_bn(
            f"encoder.conv.{3 * i + 1}",
            enc.get(f"bn_{i}"),
            enc_bs[f"bn_{i}"],
            affine=(i < 2),
        )
    for ours_dir, theirs in (("fwd", ""), ("bwd", "_reverse")):
        cell = enc["rnn"][ours_dir]["cell"]
        out[f"encoder.rnn.rnn.weight_ih_l0{theirs}"] = _lin(cell["w_ih"])
        out[f"encoder.rnn.rnn.weight_hh_l0{theirs}"] = _lin(cell["w_hh"])
        if "b_ih" in cell:
            out[f"encoder.rnn.rnn.bias_ih_l0{theirs}"] = _t(cell["b_ih"])
            out[f"encoder.rnn.rnn.bias_hh_l0{theirs}"] = _t(cell["b_hh"])
    out["encoder.rnn_h0"] = _t(enc["rnn_h0"])[None]  # [1, D] -> [1, 1, D]
    out["encoder.rnn_c0"] = _t(enc["rnn_c0"])[None]

    # ---- decoder ----
    dec = params["decoder"]
    cell = dec["cell"]
    pfx = "decoder.decoder_cell"
    put_linear(f"{pfx}.pre_net.layers.0", cell["pre_net"]["fc1"])
    put_linear(f"{pfx}.pre_net.layers.1", cell["pre_net"]["fc2"])
    out[f"{pfx}.attention_module.query_layer.weight"] = _lin(
        cell["attention"]["query_layer"]["kernel"]
    )
    out[f"{pfx}.attention_module.bias"] = np.ones((1,), np.float32)
    if m.decoder_type == "tacotron2prod":
        put_lstm_cell(f"{pfx}.attention_rnn", cell["attention_rnn"])
        put_lstm_cell(f"{pfx}.decoder_rnn", cell["decoder_rnn"])
    else:  # tacotron2
        for i in range(len(m.dim_rnn)):
            put_lstm_cell(f"{pfx}.decoder_rnn_list.{i}", cell[f"decoder_rnn_{i}"])
    for i in range(2):
        out[f"{pfx}.initial_decoder_h.{i}"] = _t(dec[f"init_h_{i}"])
        out[f"{pfx}.initial_decoder_c.{i}"] = _t(dec[f"init_c_{i}"])
    put_linear("decoder.fc_mel", dec["fc_mel"])
    put_linear("decoder.fc_stop", dec["fc_stop"])

    # ---- postnet (MelPostnet; modules.py:155-184) ----
    if m.postnet_type == "tacotron2" and "postnet" in params:
        post = params["postnet"]
        post_bs = batch_stats.get("postnet", {})
        for i in range(m.postnet_num_layers):
            out[f"postnet.conv.{i}.0.weight"] = _conv1d(post[f"conv_{i}"]["kernel"])
            put_bn(f"postnet.conv.{i}.1", post.get(f"bn_{i}"), post_bs[f"bn_{i}"])
        out["postnet.fc_out.weight"] = _lin(post["fc_out"]["kernel"])

    return out


def load_torch_state_dict(
    sd: Dict[str, np.ndarray], params: Dict[str, Any],
    batch_stats: Dict[str, Any], cfg,
) -> Tuple[Dict, Dict]:
    """Reference state_dict -> (params, batch_stats) in our structure (values
    replaced where present; same lenient policy as train_util.py:23-45)."""
    import copy

    m = cfg.model
    params = copy.deepcopy(
        {k: np.asarray(v) if not isinstance(v, dict) else v for k, v in params.items()}
    )
    params = _np_tree(params)
    batch_stats = _np_tree(batch_stats)

    def get(k, fn=None):
        v = sd.get(k)
        if v is None:
            return None
        v = _t(v)
        return fn(v) if fn else v

    def set_linear(tree, tname):
        w = get(f"{tname}.weight", _lin)
        if w is not None:
            tree["kernel"] = w
        b = get(f"{tname}.bias")
        if b is not None:
            tree["bias"] = b

    def set_lstm(tree, tname):
        cell = tree["cell"] if "cell" in tree else tree
        for ours, theirs in (("w_ih", "weight_ih"), ("w_hh", "weight_hh")):
            v = get(f"{tname}.{theirs}", _lin)
            if v is not None:
                cell[ours] = v
        for ours, theirs in (("b_ih", "bias_ih"), ("b_hh", "bias_hh")):
            v = get(f"{tname}.{theirs}")
            if v is not None and ours in cell:
                cell[ours] = v

    def set_bn(ptree, stree, tname, affine=True):
        if affine and ptree is not None:
            w, b = get(f"{tname}.weight"), get(f"{tname}.bias")
            if w is not None:
                ptree["BatchNorm_0"]["scale"] = w
            if b is not None:
                ptree["BatchNorm_0"]["bias"] = b
        rm, rv = get(f"{tname}.running_mean"), get(f"{tname}.running_var")
        if rm is not None:
            stree["BatchNorm_0"]["mean"] = rm
        if rv is not None:
            stree["BatchNorm_0"]["var"] = rv

    enc = params["encoder"]
    enc_bs = batch_stats["encoder"]
    v = get("encoder.emb.weight")
    if v is not None:
        enc["emb"]["embedding"] = v
    for i in range(3):
        w = get(f"encoder.conv.{3 * i}.weight", _conv1d)
        if w is not None:
            enc[f"conv_{i}"]["kernel"] = w
        set_bn(enc.get(f"bn_{i}"), enc_bs[f"bn_{i}"], f"encoder.conv.{3 * i + 1}",
               affine=(i < 2))
    for ours_dir, theirs in (("fwd", ""), ("bwd", "_reverse")):
        cell = enc["rnn"][ours_dir]["cell"]
        for ours, t in (("w_ih", "weight_ih_l0"), ("w_hh", "weight_hh_l0")):
            v = get(f"encoder.rnn.rnn.{t}{theirs}", _lin)
            if v is not None:
                cell[ours] = v
    for nm in ("rnn_h0", "rnn_c0"):
        v = get(f"encoder.{nm}")
        if v is not None:
            enc[nm] = v.reshape(1, -1)

    dec = params["decoder"]
    cell = dec["cell"]
    pfx = "decoder.decoder_cell"
    set_linear(cell["pre_net"]["fc1"], f"{pfx}.pre_net.layers.0")
    set_linear(cell["pre_net"]["fc2"], f"{pfx}.pre_net.layers.1")
    v = get(f"{pfx}.attention_module.query_layer.weight", _lin)
    if v is not None:
        cell["attention"]["query_layer"]["kernel"] = v
    if m.decoder_type == "tacotron2prod":
        set_lstm(cell["attention_rnn"], f"{pfx}.attention_rnn")
        set_lstm(cell["decoder_rnn"], f"{pfx}.decoder_rnn")
    else:
        for i in range(len(m.dim_rnn)):
            set_lstm(cell[f"decoder_rnn_{i}"], f"{pfx}.decoder_rnn_list.{i}")
    for i in range(2):
        for ours, theirs in ((f"init_h_{i}", f"initial_decoder_h.{i}"),
                             (f"init_c_{i}", f"initial_decoder_c.{i}")):
            v = get(f"{pfx}.{theirs}")
            if v is not None:
                dec[ours] = v
    set_linear(dec["fc_mel"], "decoder.fc_mel")
    set_linear(dec["fc_stop"], "decoder.fc_stop")

    if m.postnet_type == "tacotron2" and "postnet" in params:
        post = params["postnet"]
        post_bs = batch_stats["postnet"]
        for i in range(m.postnet_num_layers):
            w = get(f"postnet.conv.{i}.0.weight", _conv1d)
            if w is not None:
                post[f"conv_{i}"]["kernel"] = w
            set_bn(post.get(f"bn_{i}"), post_bs[f"bn_{i}"], f"postnet.conv.{i}.1")
        w = get("postnet.fc_out.weight", _lin)
        if w is not None:
            post["fc_out"]["kernel"] = w

    return params, batch_stats


def _np_tree(tree):
    if isinstance(tree, dict):
        return {k: _np_tree(v) for k, v in tree.items()}
    return np.asarray(tree)


def load_reference_checkpoint(path: str, cfg, params, batch_stats):
    """Load a reference tacotron checkpoint.pt ({step, model_state, ...},
    train_util.py:170-207)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state", blob)
    sd = {k.replace("module.", ""): v.numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}
    return load_torch_state_dict(sd, params, batch_stats, cfg)
