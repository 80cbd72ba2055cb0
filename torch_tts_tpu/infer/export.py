"""Model export: serialized StableHLO with the reference's ONNX signature.

Equivalent of /root/reference/vits2/export_onnx.py:59-104, which rebinds
forward to an infer wrapper over (text, text_lengths, scales[3], sid) and
exports opset-15 ONNX. The TPU-native artifact is a jax.export serialized
StableHLO module with the SAME logical signature — loadable from any PJRT
runtime (including the C++ driver in csrc/) via jax.export.deserialize.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def export_vits2_infer(
    model,
    params,
    max_text_len: int = 512,
    max_frames: int = 1000,
    multispeaker: bool = False,
    path: Optional[str] = None,
) -> bytes:
    """Serialize jitted VITS2 inference.

    Signature (mirrors export_onnx.py `infer_forward`):
      (text [1, T], text_lengths [1], scales [3] = (noise, length, noise_w),
       sid [1] if multispeaker) -> (audio [1, max_frames*hop, 1], y_lengths [1])
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from torch_tts_tpu.models.vits2.model import SynthesizerTrn

    def infer_forward(params, text, text_lengths, scales, sid=None):
        audio, attn, y_mask, _aux, y_lengths = model.apply(
            {"params": params},
            text,
            text_lengths,
            sid=sid,
            noise_scale=scales[0],
            length_scale=scales[1],
            noise_scale_w=scales[2],
            max_frames=max_frames,
            method=SynthesizerTrn.infer,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        return audio, y_lengths

    text = jnp.zeros((1, max_text_len), jnp.int32)
    text_lengths = jnp.asarray([max_text_len], jnp.int32)
    scales = jnp.asarray([0.667, 1.0, 0.8], jnp.float32)
    args = (params, text, text_lengths, scales)
    if multispeaker:
        args = args + (jnp.zeros((1,), jnp.int32),)

    exported = jexport.export(jax.jit(infer_forward))(*args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize an exported module; call via `.call(*args)`."""
    from jax import export as jexport

    blob = path_or_bytes
    if isinstance(path_or_bytes, str):
        blob = open(path_or_bytes, "rb").read()
    return jexport.deserialize(blob)


def export_vits2_savedmodel(
    model,
    params,
    out_dir: str,
    max_text_len: int = 512,
    max_frames: int = 1000,
) -> None:
    """TF SavedModel export via jax2tf — the deployment-interchange analogue
    of the reference's ONNX export (runnable by TF Serving / TFLite tooling
    the way onnxruntime runs the reference's artifact). Same logical
    signature: (text, text_lengths, scales) -> (audio, y_lengths)."""
    import jax
    import tensorflow as tf
    from jax.experimental import jax2tf

    from torch_tts_tpu.models.vits2.model import SynthesizerTrn

    def infer_forward(params, text, text_lengths, scales):
        audio, attn, y_mask, _aux, y_lengths = model.apply(
            {"params": params},
            text,
            text_lengths,
            noise_scale=scales[0],
            length_scale=scales[1],
            noise_scale_w=scales[2],
            max_frames=max_frames,
            method=SynthesizerTrn.infer,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        return audio, y_lengths

    tf_fn = jax2tf.convert(infer_forward, with_gradient=False)
    tf_params = tf.nest.map_structure(tf.constant, jax.device_get(params))

    module = tf.Module()
    module._params = tf_params

    @tf.function(
        input_signature=[
            tf.TensorSpec([1, max_text_len], tf.int32, name="text"),
            tf.TensorSpec([1], tf.int32, name="text_lengths"),
            tf.TensorSpec([3], tf.float32, name="scales"),
        ],
        jit_compile=True,
    )
    def serving(text, text_lengths, scales):
        audio, y_lengths = tf_fn(module._params, text, text_lengths, scales)
        return {"audio": audio, "y_lengths": y_lengths}

    module.serving = serving
    tf.saved_model.save(
        module, out_dir, signatures={"serving_default": serving}
    )
