"""Checkpoint converter CLI: reference PyTorch .pth <-> torch_tts_tpu .msgpack.

The migration path for users of the reference repo — bring an existing
G_*.pth (and optionally D_*.pth) and get a run-dir checkpoint this
framework's trainer/CLIs consume, or export a trained flax checkpoint back
to a reference-loadable state dict (vits2/utils.py:15-47 semantics).

  # reference -> here (then resume training or infer from runs/imported)
  python -m torch_tts_tpu.cli.convert_checkpoint --model vits2 \
      -c configs/vits2-ljspeech.yaml --from-torch G_114000.pth \
      --mpd D_114000.pth -o runs/imported

  # here -> reference (G_<step>.pth / D_<step>.pth with {model, iteration})
  python -m torch_tts_tpu.cli.convert_checkpoint --model vits2 \
      -c configs/vits2-ljspeech.yaml --to-torch runs/ljspeech -o exported/

  # tacotron checkpoint.pt -> here
  python -m torch_tts_tpu.cli.convert_checkpoint --model tacotron \
      -c configs/tacotron-ljspeech.yaml --from-torch checkpoint_120000.pt \
      -o runs/taco-imported

Weight mapping lives in models/{vits2,tacotron}/convert.py and is verified
by the oracle-parity tests (tests/test_reference_parity.py,
tests/test_vits2_convert.py): waveforms from converted weights match the
reference to <2e-4. Notes: the optimizer state is NOT converted (torch Adam
moments don't map onto optax's pytree layout) — a resumed run re-warms its
optimizer, mirroring what the reference's own lenient loader does when
optimizers mismatch (vits2/utils.py:25-29). The duration-discriminator
(DUR_*.pth) has no converter yet; it re-initializes on import.
"""

from __future__ import annotations

import argparse
import logging
import os
import re

logger = logging.getLogger(__name__)


def _step_of(path: str, fallback: int = 0) -> int:
    m = re.search(r"(\d+)(?:\.pth|\.pt|\.msgpack)?$", os.path.basename(path))
    return int(m.group(1)) if m else fallback


def _vits2_from_torch(args) -> None:
    import numpy as np

    from torch_tts_tpu.core.config import load_vits2_config
    from torch_tts_tpu.models.vits2.convert import (
        convert_mpd,
        load_reference_checkpoint,
    )
    from torch_tts_tpu.train import checkpoint as ckpt

    cfg = load_vits2_config(args.config)
    params_g, report = load_reference_checkpoint(args.from_torch, cfg.model)
    if report["missing"] or report["unused"]:
        logger.warning("generator: %d torch keys missing, %d unused",
                       len(report["missing"]), len(report["unused"]))
    else:
        logger.info("generator: converted cleanly")
    tree = {"step": np.asarray(_step_of(args.from_torch), np.int32),
            "params_g": params_g}
    if args.mpd:
        import torch

        blob = torch.load(args.mpd, map_location="cpu", weights_only=False)
        sd = blob.get("model", blob)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        params_d, _rep = convert_mpd(sd)
        tree["params_d"] = params_d
        logger.info("discriminator: converted")
    step = int(tree["step"])
    path = ckpt.save_checkpoint(args.output, step, tree, keep=0)
    print(f"wrote {path} (restores leniently into the trainer state; "
          "optimizers re-warm)")


def _vits2_to_torch(args) -> None:
    import numpy as np
    import torch

    from torch_tts_tpu.core.config import load_vits2_config
    from torch_tts_tpu.models.vits2.convert import (
        export_mpd_torch_state_dict,
        export_torch_state_dict,
    )
    from torch_tts_tpu.train import checkpoint as ckpt
    from torch_tts_tpu.train.vits2_trainer import build_models

    cfg = load_vits2_config(args.config)
    src = args.to_torch
    if not src.endswith(".msgpack"):
        src = ckpt.latest_checkpoint(src)
        if src is None:
            raise SystemExit(f"no checkpoint found in {args.to_torch}")
    import jax

    model, mpd, _ = build_models(cfg)
    # structure template from abstract init (no compile, no device memory)
    import jax.numpy as jnp

    x = jnp.zeros((1, 8), jnp.int32)
    xl = jnp.full((1,), 8, jnp.int32)
    spec = jnp.zeros((1, 16, cfg.posterior_channels), jnp.float32)
    sl = jnp.full((1,), 16, jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    shapes = jax.eval_shape(lambda: model.init(rngs, x, xl, spec, sl))
    g_tpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes["params"])
    seg = cfg.model.segment_size
    d_shapes = jax.eval_shape(lambda: mpd.init(
        {"params": jax.random.PRNGKey(3)},
        jnp.zeros((1, seg, 1)), jnp.zeros((1, seg, 1))))
    d_tpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), d_shapes["params"])

    loaded = ckpt.restore_checkpoint(
        src, {"params_g": g_tpl, "params_d": d_tpl}, lenient=True
    )
    step = _step_of(src)
    os.makedirs(args.output, exist_ok=True)

    sd_g = export_torch_state_dict(loaded["params_g"], cfg.model)
    out_g = os.path.join(args.output, f"G_{step}.pth")
    torch.save(
        {"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in sd_g.items()},
         "iteration": step, "learning_rate": cfg.train.learning_rate,
         "optimizer": None},
        out_g,
    )
    print(f"wrote {out_g} ({len(sd_g)} tensors)")

    sd_d = export_mpd_torch_state_dict(loaded["params_d"])
    out_d = os.path.join(args.output, f"D_{step}.pth")
    torch.save(
        {"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in sd_d.items()},
         "iteration": step, "learning_rate": cfg.train.learning_rate,
         "optimizer": None},
        out_d,
    )
    print(f"wrote {out_d} ({len(sd_d)} tensors)")


def _tacotron_from_torch(args) -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import load_tacotron_config
    from torch_tts_tpu.models.tacotron import build_tacotron
    from torch_tts_tpu.models.tacotron.convert import load_reference_checkpoint
    from torch_tts_tpu.train import checkpoint as ckpt

    cfg = load_tacotron_config(args.config)
    model = build_tacotron(cfg)
    c = jnp.zeros((1, 8), jnp.int32)
    cl = jnp.full((1,), 8, jnp.int32)
    xm = jnp.zeros((1, 12, cfg.audio.num_mels), jnp.float32)
    xl = jnp.full((1,), 12, jnp.int32)
    variables = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, c, cl, xm, xl,
        train=True, deterministic=False))
    tpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    params, batch_stats = load_reference_checkpoint(
        args.from_torch, cfg, tpl["params"], tpl.get("batch_stats", {})
    )
    step = _step_of(args.from_torch)
    tree = {"step": np.asarray(step, np.int32), "params": params,
            "batch_stats": batch_stats}
    path = ckpt.save_checkpoint(args.output, step, tree, keep=0)
    print(f"wrote {path}")


def main() -> None:
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--model", choices=("vits2", "tacotron"), required=True)
    p.add_argument("-c", "--config", required=True)
    d = p.add_mutually_exclusive_group(required=True)
    d.add_argument("--from-torch", metavar="PTH",
                   help="reference checkpoint (G_*.pth / checkpoint.pt) -> msgpack run dir")
    d.add_argument("--to-torch", metavar="RUN_OR_MSGPACK",
                   help="our run dir / ckpt_*.msgpack -> reference .pth files")
    p.add_argument("--mpd", default=None,
                   help="reference D_*.pth to convert alongside (vits2 --from-torch)")
    p.add_argument("-o", "--output", required=True,
                   help="output run dir (--from-torch) or directory (--to-torch)")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    if args.model == "vits2":
        if args.from_torch:
            _vits2_from_torch(args)
        else:
            _vits2_to_torch(args)
    else:
        if args.from_torch:
            _tacotron_from_torch(args)
        else:
            raise SystemExit(
                "tacotron --to-torch: use models/tacotron/convert.py's "
                "export_torch_state_dict (not wired as a CLI yet)"
            )


if __name__ == "__main__":
    main()
