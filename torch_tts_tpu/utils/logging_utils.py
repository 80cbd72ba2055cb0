"""Observability: tensorboard summaries, plotting, file loggers, provenance.

Equivalents of /root/reference/vits2/utils.py:69-275 — `summarize` writing
scalars/histograms/images/audio, matplotlib spectrogram/alignment renderers,
the per-run file logger, and `check_git_hash` provenance — using tensorboardX
(torch's SummaryWriter is torch-only; tensorboardX writes the same event
files).
"""

from __future__ import annotations

import logging
import os
import subprocess
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def make_writer(log_dir: str):
    from tensorboardX import SummaryWriter

    os.makedirs(log_dir, exist_ok=True)
    return SummaryWriter(log_dir=log_dir)


def summarize(
    writer,
    global_step: int,
    scalars: Optional[Dict[str, float]] = None,
    histograms: Optional[Dict[str, np.ndarray]] = None,
    images: Optional[Dict[str, np.ndarray]] = None,
    audios: Optional[Dict[str, np.ndarray]] = None,
    audio_sampling_rate: int = 22050,
) -> None:
    for k, v in (scalars or {}).items():
        writer.add_scalar(k, float(v), global_step)
    for k, v in (histograms or {}).items():
        writer.add_histogram(k, np.asarray(v), global_step)
    for k, v in (images or {}).items():
        writer.add_image(k, np.asarray(v), global_step, dataformats="HWC")
    for k, v in (audios or {}).items():
        _add_audio(writer, k, np.asarray(v), global_step, audio_sampling_rate)


def _add_audio(writer, tag: str, wav: np.ndarray, global_step: int,
               sample_rate: int) -> None:
    """TB audio summary without soundfile (absent in this image):
    scipy-encoded 16-bit WAV wrapped in the Summary proto directly
    (tensorboardX's add_audio path imports soundfile for the encode)."""
    import io

    from scipy.io import wavfile
    from tensorboardX.proto.summary_pb2 import Summary

    wav = np.clip(np.asarray(wav, np.float32).reshape(-1), -1.0, 1.0)
    buf = io.BytesIO()
    wavfile.write(buf, sample_rate, np.round(np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16))
    audio = Summary.Audio(
        sample_rate=sample_rate,
        num_channels=1,
        length_frames=wav.shape[0],
        encoded_audio_string=buf.getvalue(),
        content_type="audio/wav",
    )
    writer._get_file_writer().add_summary(
        Summary(value=[Summary.Value(tag=tag, audio=audio)]), global_step
    )


def plot_spectrogram_to_numpy(spectrogram: np.ndarray) -> np.ndarray:
    """[C, T] or [T, C] spectrogram -> HWC uint8 image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spec = np.asarray(spectrogram)
    if spec.shape[0] > spec.shape[1]:
        spec = spec.T
    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(spec, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def plot_alignment_to_numpy(alignment: np.ndarray, info: Optional[str] = None) -> np.ndarray:
    """[T_dec, T_enc] attention matrix -> HWC uint8 image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(
        np.asarray(alignment).T, aspect="auto", origin="lower", interpolation="none"
    )
    plt.colorbar(im, ax=ax)
    xlabel = "Decoder timestep" + (f"\n\n{info}" if info else "")
    plt.xlabel(xlabel)
    plt.ylabel("Encoder timestep")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def get_logger(model_dir: str, filename: str = "train.log") -> logging.Logger:
    log = logging.getLogger(os.path.basename(model_dir))
    log.setLevel(logging.DEBUG)
    os.makedirs(model_dir, exist_ok=True)
    h = logging.FileHandler(os.path.join(model_dir, filename))
    h.setLevel(logging.DEBUG)
    h.setFormatter(
        logging.Formatter("%(asctime)s\t%(name)s\t%(levelname)s\t%(message)s")
    )
    log.addHandler(h)
    return log


def check_git_hash(model_dir: str) -> None:
    """Record/compare the repo commit for experiment provenance
    (vits2/utils.py:238-260)."""
    source_dir = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    if not os.path.exists(os.path.join(source_dir, ".git")):
        return
    try:
        cur_hash = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=source_dir,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return
    path = os.path.join(model_dir, "githash")
    if os.path.exists(path):
        saved = open(path).read().strip()
        if saved != cur_hash:
            logger.warning("git hash mismatch: saved %s vs current %s",
                           saved[:8], cur_hash[:8])
    else:
        os.makedirs(model_dir, exist_ok=True)
        open(path, "w").write(cur_hash)
