"""Web UI + HTTP serving daemon for VITS2 synthesis.

Equivalent of /root/reference/vits2/webui.py (a Gradio text->wav interface
with model/config inputs), but the HTTP surface sits on the production
serving stack (infer/serving.py) instead of a one-request-at-a-time forward
(the reference synthesizes with an unbatched `infer` per click,
vits2/webui.py:65): one load-once `Synthesizer` with bucketed static shapes
and batch tiers, and a `ContinuousBatcher` so CONCURRENT requests share TPU
dispatches. Every decode is jitted — an unjitted full-decoder apply costs
hundreds of host<->device round trips (~1 min through the dev tunnel).

Uses gradio when installed; otherwise serves a dependency-free stdlib HTTP
form with the same functionality (this image has no gradio).

Endpoints (stdlib server):
  GET /          HTML form
  GET /tts?text=...[&noise=0.667][&length=1.0][&noise_w=0.8][&sid=N][&seed=N]
                 -> audio/wav; texts longer than the largest bucket are
                 sentence-chunked via synthesize_long (&pause_ms=...);
                 unsplittable input -> 400
  GET /tts_stream?text=...[&chunk=64][same params]
                 -> chunked-transfer raw PCM (s16le mono; rate in the
                 X-Sample-Rate header) — audio bytes start flowing at
                 time-to-first-chunk (~5 ms decode on a v5e), not after the
                 full utterance is synthesized; over-bucket texts stream
                 sentence-by-sentence (stream_long). `chunk` (and the taco
                 stream's chunk/pad) must be on the server's allowlist
                 (make_server stream_chunks/taco_stream_params) — stream
                 programs compile per distinct value, so client-chosen
                 values are bounded; off-list -> 400
  GET /tts_taco?text=...[&seed=N]
                 -> audio/wav through the tacotron serving layer (when a
                 tacotron model is loaded; else 404)
  GET /tts_taco_stream?text=...[&chunk=32][&pad=48][&seed=N]
                 -> chunked-transfer raw PCM from the tacotron AR stream
                 (first audio after ~2 AR chunks, not after max_steps)
  GET /healthz   -> JSON: buckets, batch tiers, compiled executables
  GET /metrics   -> Prometheus text format: request/failure/batch counters,
                 dispatch-time sum, queue depth, compiled executables

Usage:
  python -m torch_tts_tpu.cli.webui -c config.yaml -m runs/ljspeech \
      [--port 7860] [--warmup]
"""

from __future__ import annotations

import argparse
import io
import json
import logging

logger = logging.getLogger(__name__)

_FORM = """<!doctype html><title>torch_tts_tpu</title>
<h2>torch_tts_tpu — VITS2 synthesis</h2>
<form action=/tts method=get>
  <input name=text size=80 value="speech synthesis on tensor processing units">
  noise <input name=noise value=0.667 size=5>
  length <input name=length value=1.0 size=5>
  <button>synthesize</button>
</form>"""


def wav_bytes(audio, sample_rate: int) -> bytes:
    import numpy as np
    from scipy.io import wavfile

    buf = io.BytesIO()
    wav = np.round(np.clip(audio, -1.0, 1.0) * 32767).astype(np.int16)
    wavfile.write(buf, sample_rate, wav)
    return buf.getvalue()


def emit_pcm_chunk(wfile, a) -> None:
    """Write one float audio array as an s16le chunked-transfer body chunk."""
    import numpy as np

    pcm = np.round(np.clip(a, -1.0, 1.0) * 32767).astype("<i2").tobytes()
    wfile.write(f"{len(pcm):x}\r\n".encode())
    wfile.write(pcm)
    wfile.write(b"\r\n")


def make_server(synth, port: int = 0, host: str = "0.0.0.0", taco_synth=None,
                stream_chunks=(64,), taco_stream_params=((32, 48),)):
    """HTTP server over a ContinuousBatcher. Returns (server, batcher);
    callers run server.serve_forever() (a thread in tests, the main thread
    in `main`). ThreadingHTTPServer handles each request on its own thread,
    so simultaneous /tts requests land in the batcher's queue together and
    ride one TPU dispatch.

    With `taco_synth` (infer/taco_serving.TacotronSynthesizer), /tts_taco
    serves the AR model family through the same process — text -> AR mel ->
    fused neural vocoder (or Griffin-Lim) in its own bucketed executables.

    `stream_chunks` / `taco_stream_params` are the SERVER-side allowlists
    for the /tts_stream `chunk` and /tts_taco_stream `(chunk, pad)` query
    params: stream programs are compiled and cached per distinct value, so
    client-chosen values must be bounded or a query sweep would grow the
    executable cache without limit (multi-minute server-side compiles each
    through a tunneled backend) and dodge the --warmup guarantee. Off-list
    values get a 400 naming the allowed ones."""
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from torch_tts_tpu.infer.serving import ContinuousBatcher

    stream_chunks = set(stream_chunks)
    taco_stream_params = set(tuple(p) for p in taco_stream_params)

    batcher = ContinuousBatcher(synth)
    # the tacotron synthesizer exposes the same dispatch/collect interface,
    # so concurrent /tts_taco requests share TPU batches too
    taco_batcher = (
        ContinuousBatcher(taco_synth) if taco_synth is not None else None
    )

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked transfer for /tts_stream

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            if url.path == "/tts":
                q = urllib.parse.parse_qs(url.query)
                text = q.get("text", ["hello"])[0]
                kw = dict(
                    noise_scale=float(q.get("noise", ["0.667"])[0]),
                    length_scale=float(q.get("length", ["1.0"])[0]),
                    noise_scale_w=float(q.get("noise_w", ["0.8"])[0]),
                    sid=int(q["sid"][0]) if "sid" in q else None,
                    seed=int(q.get("seed", ["1234"])[0]),
                )
                try:
                    if len(synth.encode_text(text)) > synth.buckets[-1][0]:
                        # longer than the largest bucket: sentence-chunked
                        # long-form path (one caller, not batched)
                        r = synth.synthesize_long(
                            text,
                            pause_ms=float(q.get("pause_ms", ["0"])[0]),
                            **kw,
                        )
                    else:
                        r = batcher.submit(text, **kw).result(timeout=600)
                except Exception as e:  # surfaced per-request, server lives on
                    self._send(400, f"synthesis failed: {e}".encode(),
                               "text/plain; charset=utf-8")
                    return
                self._send(200, wav_bytes(r.audio, r.sample_rate), "audio/wav")
            elif url.path == "/tts_taco":
                if taco_synth is None:
                    self._send(404, b"no tacotron model loaded",
                               "text/plain; charset=utf-8")
                    return
                q = urllib.parse.parse_qs(url.query)
                text = q.get("text", ["hello"])[0]
                try:
                    r = taco_batcher.submit(
                        text, seed=int(q.get("seed", ["1234"])[0])
                    ).result(timeout=600)
                except Exception as e:
                    self._send(400, f"synthesis failed: {e}".encode(),
                               "text/plain; charset=utf-8")
                    return
                self._send(200, wav_bytes(r.audio, r.sample_rate), "audio/wav")
            elif url.path == "/tts_taco_stream":
                if taco_synth is None:
                    self._send(404, b"no tacotron model loaded",
                               "text/plain; charset=utf-8")
                    return
                q = urllib.parse.parse_qs(url.query)
                try:
                    cp = (int(q.get("chunk", ["32"])[0]),
                          int(q.get("pad", ["48"])[0]))
                    if cp not in taco_stream_params:
                        raise ValueError(
                            f"unsupported (chunk, pad)={cp}; allowed: "
                            f"{sorted(taco_stream_params)}")
                    chunks = taco_synth.stream(
                        q.get("text", ["hello"])[0],
                        seed=int(q.get("seed", ["1234"])[0]),
                        chunk_steps=cp[0],
                        pad_frames=cp[1],
                    )
                    first = next(chunks, None)
                except Exception as e:
                    self._send(400, f"synthesis failed: {e}".encode(),
                               "text/plain; charset=utf-8")
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("X-Sample-Rate",
                                 str(taco_synth.cfg.audio.sample_rate))
                self.send_header("X-Format", "s16le-mono")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                if first is not None:
                    emit_pcm_chunk(self.wfile, first)
                    for a in chunks:
                        emit_pcm_chunk(self.wfile, a)
                self.wfile.write(b"0\r\n\r\n")
            elif url.path == "/tts_stream":
                q = urllib.parse.parse_qs(url.query)
                try:
                    text = q.get("text", ["hello"])[0]
                    chunk = int(q.get("chunk", ["64"])[0])
                    if chunk not in stream_chunks:
                        raise ValueError(
                            f"unsupported chunk={chunk}; allowed: "
                            f"{sorted(stream_chunks)}")
                    kw = dict(
                        chunk_frames=chunk,
                        noise_scale=float(q.get("noise", ["0.667"])[0]),
                        length_scale=float(q.get("length", ["1.0"])[0]),
                        noise_scale_w=float(q.get("noise_w", ["0.8"])[0]),
                        sid=int(q["sid"][0]) if "sid" in q else None,
                        seed=int(q.get("seed", ["1234"])[0]),
                    )
                    if len(synth.encode_text(text)) > synth.buckets[-1][0]:
                        chunks = synth.stream_long(
                            text,
                            pause_ms=float(q.get("pause_ms", ["0"])[0]),
                            **kw,
                        )
                    else:
                        chunks = synth.stream(text, **kw)
                    first = next(chunks, None)  # synth errors -> 400, pre-headers
                except Exception as e:
                    self._send(400, f"synthesis failed: {e}".encode(),
                               "text/plain; charset=utf-8")
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("X-Sample-Rate",
                                 str(synth.cfg.audio.sampling_rate))
                self.send_header("X-Format", "s16le-mono")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                if first is not None:
                    emit_pcm_chunk(self.wfile, first)
                    for a in chunks:
                        emit_pcm_chunk(self.wfile, a)
                self.wfile.write(b"0\r\n\r\n")
            elif url.path == "/metrics":
                s = batcher.stats()
                lines = []
                for k, v in sorted(s.items()):
                    name = f"tts_{k}"
                    kind = ("gauge" if k == "queue_depth" else "counter")
                    lines.append(f"# TYPE {name} {kind}")
                    lines.append(f"{name} {v}")
                if taco_batcher is not None:
                    for k, v in sorted(taco_batcher.stats().items()):
                        name = f"tts_taco_{k}"
                        kind = ("gauge" if k == "queue_depth" else "counter")
                        lines.append(f"# TYPE {name} {kind}")
                        lines.append(f"{name} {v}")
                lines.append("# TYPE tts_compiled_executables gauge")
                lines.append(
                    f"tts_compiled_executables {len(synth._infer_cache)}")
                body = ("\n".join(lines) + "\n").encode()
                self._send(200, body, "text/plain; version=0.0.4")
            elif url.path == "/healthz":
                payload = {
                    "status": "ok",
                    "buckets": [list(b) for b in synth.buckets],
                    "batch_tiers": list(synth.batch_tiers),
                    "compiled_executables": len(synth._infer_cache),
                    "tacotron": taco_synth is not None,
                }
                self._send(200, json.dumps(payload).encode(), "application/json")
            else:
                self._send(200, _FORM.encode(), "text/html; charset=utf-8")

        def log_message(self, fmt, *args):
            logger.info("webui: " + fmt, *args)

    server = ThreadingHTTPServer((host, port), Handler)
    server.taco_batcher = taco_batcher  # for caller shutdown (may be None)
    return server, batcher


def serve_stdlib(synth, port: int, taco_synth=None) -> None:
    server, batcher = make_server(synth, port, taco_synth=taco_synth)
    print(f"serving on http://0.0.0.0:{server.server_address[1]}")
    try:
        server.serve_forever()
    finally:
        batcher.close()
        if server.taco_batcher is not None:
            server.taco_batcher.close()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-m", "--model-dir", required=True)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--warmup", action="store_true",
                   help="precompile the full (bucket x tier) executable grid "
                        "before accepting traffic")
    p.add_argument("--taco-config", default=None,
                   help="also serve a tacotron model at /tts_taco")
    p.add_argument("--taco-run-dir", default=None)
    p.add_argument("--taco-vocoder", default=None,
                   help="vocoder artifact for /tts_taco (else Griffin-Lim)")
    p.add_argument("--fetch-timeout", type=float, default=None,
                   help="per-fetch watchdog deadline in seconds: a wedged "
                        "device->host fetch (half-down tunnel) fails THAT "
                        "request with FetchTimeoutError instead of hanging "
                        "the serving loop; counted in /metrics as "
                        "fetch_timeouts_total (default: unbounded, or "
                        "TTS_FETCH_TIMEOUT_S)")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    from torch_tts_tpu.infer.serving import Synthesizer

    taco_synth = None
    if bool(args.taco_config) != bool(args.taco_run_dir):
        p.error("--taco-config and --taco-run-dir must be given together")
    if args.taco_config and args.taco_run_dir:
        from torch_tts_tpu.infer.taco_serving import TacotronSynthesizer

        taco_synth = TacotronSynthesizer.from_run_dir(
            args.taco_config, args.taco_run_dir,
            vocoder_path=args.taco_vocoder,
            fetch_timeout_s=args.fetch_timeout,
        )
        if args.warmup:
            taco_synth.warmup()
            taco_synth.warmup_streaming()

    synth = Synthesizer.from_run_dir(args.config, args.model_dir,
                                     fetch_timeout_s=args.fetch_timeout)
    if args.warmup:
        n = synth.warmup()
        ns = synth.warmup_streaming()
        logger.info("warmup: %d batch executables + streaming path for "
                    "%d buckets", n, ns)

    if taco_synth is not None:
        # the gradio Interface has no /tts_taco route — a loaded (and
        # possibly warmed-up) tacotron model must stay reachable, so the
        # stdlib server hosts both model families
        serve_stdlib(synth, args.port, taco_synth=taco_synth)
        return

    try:
        import gradio as gr  # pragma: no cover - not in this image

        def fn(text, noise_scale, length_scale):
            r = synth.synthesize(
                [text], noise_scale=noise_scale, length_scale=length_scale
            )[0]
            return r.sample_rate, r.audio

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
        serve_stdlib(synth, args.port, taco_synth=taco_synth)


if __name__ == "__main__":
    main()
