"""Export VITS2 inference artifacts for the native C++ server (ttsrt_infer).

The training side of the native story exists (export_classifier_artifacts.py
+ csrc/driver/train_main.cc); this is the INFERENCE side: Python builds or
loads the model, jits `SynthesizerTrn.infer` at one static bucket shape with
a flat-argument signature, and exports everything the C++ binary needs to
synthesize text -> WAV with no Python in the loop:

  <out>/infer.mlir, infer.copts   (params..., x[1,P], xl[1], scales[3],
                                   seed[1]) -> (audio[1,S,1], y_lengths[1])
  <out>/params.ttsb               flat generator params (tree-flatten order)
  <out>/symbols.txt               one symbol per line; line index = id
  <out>/meta.txt                  key=value: pad_text, max_frames,
                                  hop_length, sampling_rate, add_blank

Lowering runs on CPU by default (tracing only — no TPU needed to export;
the StableHLO is standard convolution/elementwise ops the TPU compiler
consumes as-is). Checkpointed weights via --model-dir; otherwise host-random
weights (timing/plumbing demos are weight-value independent).

Usage:
  python scripts/export_infer_artifacts.py [--out artifacts/infer]
      [--config CFG] [--model-dir DIR_OR_MSGPACK]
      [--pad-text 256] [--max-frames 1024]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(out_dir: str, config: str | None, model_dir: str | None,
          pad_text: int, max_frames: int) -> None:
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config, load_vits2_config
    from torch_tts_tpu.infer.artifacts import export_flat_fn, write_ttsb
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import symbols
    from torch_tts_tpu.train.vits2_trainer import build_models

    os.makedirs(out_dir, exist_ok=True)

    if config:
        cfg = load_vits2_config(config)
    else:
        import dataclasses

        cfg = VITS2Config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, pack_narrow_convs=True)
        )
    model, _, _ = build_models(cfg)

    x = jnp.zeros((1, pad_text), jnp.int32)
    xl = jnp.asarray([pad_text], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    shapes = jax.eval_shape(lambda: model.init(
        rngs, x, xl, max_frames=max_frames, method=SynthesizerTrn.infer))
    host = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: (0.02 * host.standard_normal(s.shape)).astype(np.float32)
        if jnp.issubdtype(s.dtype, jnp.floating)
        else np.zeros(s.shape, s.dtype),
        shapes,
    )["params"]
    if model_dir:
        from torch_tts_tpu.train import checkpoint as ckpt

        path = model_dir
        if not path.endswith(".msgpack"):
            path = ckpt.latest_checkpoint(model_dir)
            if path is None:
                raise SystemExit(f"no checkpoint in {model_dir}")
        params = ckpt.restore_checkpoint(path, {"params_g": params})["params_g"]

    leaves, treedef = jax.tree_util.tree_flatten(params)
    n_leaves = len(leaves)

    def infer_flat(*args):
        ps = jax.tree_util.tree_unflatten(treedef, args[:n_leaves])
        x, xl, scales, seed = args[n_leaves:]
        key = jax.random.PRNGKey(seed[0])
        audio, _attn, _y_mask, _aux, y_lengths = model.apply(
            {"params": ps}, x, xl,
            noise_scale=scales[0], length_scale=scales[1],
            noise_scale_w=scales[2],
            max_frames=max_frames, method=SynthesizerTrn.infer,
            rngs={"noise": key},
        )
        return audio, y_lengths

    flat_args = tuple(jnp.asarray(l) for l in leaves) + (
        x, xl,
        jnp.asarray([0.667, 1.0, 0.8], jnp.float32),
        jnp.asarray([1234], jnp.int32),
    )
    export_flat_fn(infer_flat, flat_args, os.path.join(out_dir, "infer"))
    write_ttsb(os.path.join(out_dir, "params.ttsb"),
               [np.asarray(l) for l in leaves])

    with open(os.path.join(out_dir, "symbols.txt"), "w") as f:
        f.write("\n".join(symbols))
    with open(os.path.join(out_dir, "meta.txt"), "w") as f:
        f.write(
            f"pad_text={pad_text}\n"
            f"max_frames={max_frames}\n"
            f"hop_length={cfg.audio.hop_length}\n"
            f"sampling_rate={cfg.audio.sampling_rate}\n"
            f"add_blank={int(cfg.data.add_blank)}\n"
            f"n_params={n_leaves}\n"
            f"cleaners={','.join(cfg.data.text_cleaners)}\n"
        )
    audio_s = max_frames * cfg.audio.hop_length / cfg.audio.sampling_rate
    print(f"exported infer artifacts to {out_dir} "
          f"({n_leaves} param tensors, x[1,{pad_text}] -> "
          f"{audio_s:.2f}s audio @ {cfg.audio.sampling_rate} Hz)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/infer")
    p.add_argument("--config", default=None)
    p.add_argument("--model-dir", default=None)
    p.add_argument("--pad-text", type=int, default=256)
    p.add_argument("--max-frames", type=int, default=1024)
    p.add_argument("--platform", default="cpu",
                   help="lowering platform (cpu default: export needs no "
                        "TPU; pass 'axon' to lower under the TPU plugin)")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    build(args.out, args.config, args.model_dir, args.pad_text,
          args.max_frames)
