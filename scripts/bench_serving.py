"""Serving benchmark: mixed-length workload through the ContinuousBatcher.

Measures what the reference cannot do at all (its scripts synthesize one
request per process, vits2/webui.py:65): a Poisson-ish stream of concurrent
requests of mixed lengths served by the bucketed, tier-batched, continuously
batched Synthesizer on one chip. Reports per-request latency percentiles and
aggregate real-time throughput.

Usage: python scripts/bench_serving.py [--n 64] [--concurrency 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TEXTS = [
    "hi there",
    "this is a short request",
    "a medium length sentence that covers the second bucket comfortably",
    ("this considerably longer utterance exists to exercise the largest "
     "text bucket of the serving stack with a realistic paragraph length "
     "sentence that a narration workload would contain"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64, help="total requests")
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--warmup", type=int, default=1,
                   help="warmup rounds over all buckets")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.infer.serving import ContinuousBatcher, Synthesizer
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import symbols

    cfg = VITS2Config()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, pack_narrow_convs=True),
        data=dataclasses.replace(cfg.data, text_cleaners=("basic_cleaners",)),
    )
    model = SynthesizerTrn(
        n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    # host-initialized weights (timing is weight-value independent)
    x0 = jnp.zeros((1, 8), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        x0, jnp.asarray([8], jnp.int32), max_frames=16,
        method=SynthesizerTrn.infer))
    host = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(0.02 * host.standard_normal(s.shape).astype("float32"))
        if jnp.issubdtype(s.dtype, jnp.floating)
        else jnp.zeros(s.shape, s.dtype),
        shapes,
    )["params"]
    synth = Synthesizer(cfg, params)

    # warm every (bucket x tier) executable so the measurement reflects
    # steady-state serving, not compiles: continuous batching can form a
    # group of ANY size <= max_batch in ANY bucket (the first run of this
    # bench warmed only tiers {1, 8} and the mixed workload then hit cold
    # tier-2/4 compiles, ~50 s each, blowing the request timeout)
    t0 = time.perf_counter()
    n_exec = synth.warmup()
    print(f"warmup: {n_exec} executables in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    reqs = [TEXTS[rng.integers(0, len(TEXTS))] for _ in range(args.n)]
    lat = [None] * args.n
    audio_s = [0.0] * args.n
    sem = threading.Semaphore(args.concurrency)
    sr = cfg.audio.sampling_rate

    with ContinuousBatcher(synth) as cb:
        def worker(i):
            with sem:
                t0 = time.perf_counter()
                r = cb.submit(reqs[i], seed=i).result(timeout=300)
                lat[i] = time.perf_counter() - t0
                audio_s[i] = len(r.audio) / sr

        t_start = time.perf_counter()
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(args.n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t_start

    failed = sum(1 for l in lat if l is None)
    if failed:
        print(f"ERROR: {failed}/{args.n} requests failed/timed out",
              file=sys.stderr)
        sys.exit(1)
    lat_ms = np.asarray([l * 1e3 for l in lat])
    total_audio = float(np.sum(audio_s))
    out = {
        "n_requests": args.n,
        "concurrency": args.concurrency,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "wall_s": round(wall, 2),
        "audio_s": round(total_audio, 1),
        "aggregate_rtf": round(total_audio / wall, 1),
        "compiled_executables": len(synth._infer_cache),
    }
    print(
        f"{args.n} reqs @ concurrency {args.concurrency}: "
        f"p50 {out['p50_ms']} ms, p95 {out['p95_ms']} ms, "
        f"{out['aggregate_rtf']}x RT aggregate "
        f"({out['compiled_executables']} executables)",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    from tpu_health import await_usable_tpu

    await_usable_tpu()  # half-down-tunnel guard (see scripts/tpu_health.py)
    main()
