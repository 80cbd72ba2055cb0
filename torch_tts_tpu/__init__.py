"""torch_tts_tpu — a TPU-native TTS framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of the reference PyTorch repo
kgoba/torch-tts (two TTS stacks: a Tacotron-2-style attention seq2seq
mel synthesizer and an end-to-end VITS2 text->waveform model), designed
TPU-first:

- channels-last [B, T, C] tensor layout (C rides the 128-wide lane dim),
- static shapes + masks everywhere (bucketed padding, `lax.scan` loops),
- monotonic alignment search as an on-device DP (no host round-trips),
- data parallelism via `jax.sharding.Mesh` + NamedSharding (psum over ICI),
- bf16 compute / fp32 params policy (no loss scaling needed on TPU).

Subpackage map (reference parity noted in each module's docstring):
  core      config system, masking, PRNG policy
  audio     STFT/mel frontends (vits2/mel_processing.py, tacotron/data/audio.py)
  text      symbol sets, cleaners, text encoders
  ops       neural net op library (flax.linen modules)
  kernels   Pallas TPU kernels (MAS, fused STFT+mel, gated cell)
  models    model assemblies: vits2 SynthesizerTrn, tacotron
  data      datasets, bucket samplers, collation with static shapes
  train     jitted training steps, trainers, checkpointing
  infer     inference CLIs and export
  parallel  mesh construction and sharding rules
  utils     logging, tensorboard, plotting
"""

__version__ = "0.1.0"
