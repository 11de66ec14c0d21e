"""Flax param serialization helpers (msgpack weight files).

The torch->flax converter (tools/convert_torch_weights.py) emits .msgpack
files; these helpers load/save them against a param-pytree template.
"""

from __future__ import annotations

from typing import Any

from flax import serialization


def save_params_msgpack(path: str, params: Any) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params_msgpack(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def cast_params_for_inference(params, dtype):
    """Cast all floating-point leaves to the compute dtype once, host-side.

    flax modules with ``dtype=bfloat16`` cast float32 parameters on every
    forward; at 253.6M params that is ~1 GB of f32 reads plus a materialized
    bf16 copy per call. For inference/benchmark paths, cast the tree once —
    numerically identical to the per-call cast. Training keeps f32 masters.
    """
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, params)
