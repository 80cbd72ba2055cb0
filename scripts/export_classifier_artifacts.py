"""Export artifacts for the native C++ training driver.

Builds the MNIST-style convnet of the reference's C++ app
(/root/reference/src/net.cpp: Conv2d(1->5, k5, dilation 2) -> MaxPool(2) ->
GELU -> FC(500->128) -> GELU -> dropout -> FC(128->10) -> log_softmax) with
SGD(lr=0.03) (example-app.cpp:34), and exports:

  artifacts/classifier/train_step.{mlir,copts}   (params..., x, y) -> (params..., loss)
  artifacts/classifier/eval_step.{mlir,copts}    (params..., x, y) -> (loss, accuracy)
  artifacts/classifier/init_params.ttsb
  artifacts/classifier/{train,test}_data.ttsb    (MNIST if data/ present, else synthetic)

Usage: python scripts/export_classifier_artifacts.py [--out artifacts/classifier]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(out_dir: str, batch: int = 64, synth_n: int = 2048):
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.infer.artifacts import export_flat_fn, write_ttsb

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)

    # --- model: parameters as a flat list ---
    # conv [5,5,1,5] (HWIO), conv_b [5], fc1 [5*10*10, 128], fc1_b, fc2 [128,10], fc2_b
    def init_params():
        def u(key_shape, fan_in):
            b = 1.0 / np.sqrt(fan_in)
            return rng.uniform(-b, b, key_shape).astype(np.float32)

        return [
            u((5, 5, 1, 5), 25),
            u((5,), 25),
            u((500, 128), 500),
            u((128,), 500),
            u((128, 10), 128),
            u((10,), 128),
        ]

    def forward(params, x):
        conv_w, conv_b, fc1_w, fc1_b, fc2_w, fc2_b = params
        # x [B, 28, 28, 1]; dilated conv (dilation 2, valid) -> [B, 20, 20, 5]
        y = jax.lax.conv_general_dilated(
            x, conv_w, (1, 1), "VALID", rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + conv_b
        # maxpool 2x2 -> [B, 10, 10, 5]
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        y = jax.nn.gelu(y)
        y = y.reshape(y.shape[0], -1)  # [B, 500]
        y = jax.nn.gelu(y @ fc1_w + fc1_b)
        logits = y @ fc2_w + fc2_b
        return jax.nn.log_softmax(logits, axis=-1)

    def nll_loss(params, x, y):
        logp = forward(params, x)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    LR = 0.03

    def train_step(*args):
        params = list(args[:6])
        x, y = args[6], args[7]
        loss, grads = jax.value_and_grad(nll_loss)(params, x, y)
        new_params = [p - LR * g for p, g in zip(params, grads)]
        return tuple(new_params) + (loss,)

    def eval_step(*args):
        params = list(args[:6])
        x, y = args[6], args[7]
        logp = forward(params, x)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        acc = jnp.mean((jnp.argmax(logp, -1) == y).astype(jnp.float32))
        return loss, acc

    params = init_params()
    x_ex = jnp.zeros((batch, 28, 28, 1), jnp.float32)
    y_ex = jnp.zeros((batch,), jnp.int32)
    flat_args = tuple(jnp.asarray(p) for p in params) + (x_ex, y_ex)

    export_flat_fn(train_step, flat_args, os.path.join(out_dir, "train_step"))
    export_flat_fn(eval_step, flat_args, os.path.join(out_dir, "eval_step"))
    write_ttsb(os.path.join(out_dir, "init_params.ttsb"), params)

    # --- data: MNIST idx files if available, else a learnable synthetic task
    def load_mnist(img_path, lbl_path):
        with open(img_path, "rb") as f:
            f.read(16)
            imgs = np.frombuffer(f.read(), np.uint8).reshape(-1, 28, 28, 1)
        with open(lbl_path, "rb") as f:
            f.read(8)
            lbls = np.frombuffer(f.read(), np.uint8).astype(np.int32)
        return imgs.astype(np.float32) / 255.0, lbls

    mnist_dir = "data"
    train_imgs = os.path.join(mnist_dir, "train-images-idx3-ubyte")
    if os.path.exists(train_imgs):
        x_train, y_train = load_mnist(
            train_imgs, os.path.join(mnist_dir, "train-labels-idx1-ubyte")
        )
        x_test, y_test = load_mnist(
            os.path.join(mnist_dir, "t10k-images-idx3-ubyte"),
            os.path.join(mnist_dir, "t10k-labels-idx1-ubyte"),
        )
    else:
        # synthetic: each class is a noisy 28x28 template (zero-egress stand-in)
        templates = rng.standard_normal((10, 28, 28, 1)).astype(np.float32)

        def synth(n):
            y = rng.integers(0, 10, n).astype(np.int32)
            x = templates[y] + 0.5 * rng.standard_normal((n, 28, 28, 1)).astype(np.float32)
            return x.astype(np.float32), y

        x_train, y_train = synth(synth_n)
        x_test, y_test = synth(synth_n // 4)

    write_ttsb(os.path.join(out_dir, "train_data.ttsb"), [x_train, y_train])
    write_ttsb(os.path.join(out_dir, "test_data.ttsb"), [x_test, y_test])
    print(f"exported classifier artifacts to {out_dir} "
          f"(train {len(y_train)}, test {len(y_test)})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/classifier")
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()
    build(args.out, args.batch)
