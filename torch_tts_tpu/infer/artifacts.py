"""Artifact packing for the native (C++ PJRT) driver.

The reference ships a LibTorch C++ training executable
(/root/reference/src/example-app.cpp) that builds the model and optimizer in
C++. The TPU-native split puts graph *construction* in Python/JAX and
*execution* in C++: Python exports

  - StableHLO bytecode of jitted step functions (train/eval), flat-argument
    signature,
  - serialized XLA CompileOptions (via jaxlib, so the C++ side needs no
    protobuf),
  - tensor lists (params, data) in a simple "TTSB" binary format,

and the C++ driver (csrc/driver/) loads a PJRT plugin (e.g. the TPU plugin),
compiles, and runs the training loop with parameters resident on device.

TTSB format: magic 'TTSB', u32 n_tensors, then per tensor:
  u32 dtype (0=f32, 1=i32), u32 rank, u64 dims[rank], raw little-endian data.
"""

from __future__ import annotations

import struct
from typing import List, Sequence

import numpy as np

_DTYPES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1}
_DTYPES_INV = {0: np.float32, 1: np.int32}


def write_ttsb(path: str, tensors: Sequence[np.ndarray]) -> None:
    with open(path, "wb") as f:
        f.write(b"TTSB")
        f.write(struct.pack("<I", len(tensors)))
        for t in tensors:
            t = np.ascontiguousarray(t)
            code = _DTYPES[t.dtype]
            f.write(struct.pack("<II", code, t.ndim))
            for d in t.shape:
                f.write(struct.pack("<Q", d))
            f.write(t.tobytes())


def read_ttsb(path: str) -> List[np.ndarray]:
    out = []
    with open(path, "rb") as f:
        assert f.read(4) == b"TTSB"
        (n,) = struct.unpack("<I", f.read(4))
        for _ in range(n):
            code, rank = struct.unpack("<II", f.read(8))
            dims = [struct.unpack("<Q", f.read(8))[0] for _ in range(rank)]
            dt = np.dtype(_DTYPES_INV[code])
            count = int(np.prod(dims)) if dims else 1
            data = np.frombuffer(f.read(count * dt.itemsize), dt)
            out.append(data.reshape(dims))
    return out


def export_flat_fn(fn, example_args, path_prefix: str) -> None:
    """Export jit(fn) over flat array args:
    <prefix>.mlir (StableHLO bytecode, what the C++ driver compiles via
    PJRT) + <prefix>.copts (CompileOptions) + <prefix>.jaxexp (the full
    serialized jax.export.Exported, so Python tests/tools can deserialize
    and re-execute the very program the native side runs)."""
    import jax
    from jax import export as jexport
    from jaxlib import _jax

    exported = jexport.export(jax.jit(fn))(*example_args)
    with open(path_prefix + ".mlir", "wb") as f:
        f.write(exported.mlir_module_serialized)
    with open(path_prefix + ".copts", "wb") as f:
        f.write(_jax.CompileOptions().SerializeAsString())
    with open(path_prefix + ".jaxexp", "wb") as f:
        f.write(exported.serialize())
