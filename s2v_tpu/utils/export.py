"""Model export (reference: arcface_torch/torch2onnx.py + onnx_helper.py —
ONNX export for deployment parity checks).

TPU-native analogue: serialize a jitted function to StableHLO via
jax.export — the portable deployment artifact for XLA runtimes (the role
ONNX plays for the reference). Includes a parity check mirroring
onnx_helper's output comparison.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def export_stablehlo(fn: Callable, example_args: Sequence[Any]) -> bytes:
    """Serialize jit(fn) at the example shapes to portable bytes."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    return exported.serialize()


def load_exported(blob: bytes):
    """Deserialize and return a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return lambda *args: exported.call(*args)


def save(path: str, fn: Callable, example_args: Sequence[Any]):
    blob = export_stablehlo(fn, example_args)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def check_parity(fn: Callable, blob: bytes, example_args: Sequence[Any],
                 atol: float = 1e-5) -> Tuple[bool, float]:
    """onnx_helper-style export-vs-eager output comparison."""
    restored = load_exported(blob)
    want = jax.jit(fn)(*example_args)
    got = restored(*example_args)
    err = float(
        max(
            jnp.abs(a - b).max()
            for a, b in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want))
        )
    )
    return err <= atol, err
