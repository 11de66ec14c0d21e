"""Feature matchers: mutual nearest-neighbor (+ a small rotary helper).

Parity target: gluefactory's NN matcher
(gluefactory/models/matchers/nearest_neighbor_matcher.py). The full
LightGlue lives in matching/lightglue.py (round-4 replacement of the
compact matcher that used to live here)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .registry import register_model


def mutual_nearest_neighbor(
    desc0: jax.Array,  # [N0, D] L2-normalized
    desc1: jax.Array,  # [N1, D]
    threshold: float = 0.0,
    valid0: Optional[jax.Array] = None,
    valid1: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Mutual-NN matching with cosine-similarity threshold.

    Returns matches0 [N0] (index into set 1 or -1) and scores0 [N0].
    """
    sim = desc0 @ desc1.T  # [N0, N1]
    if valid0 is not None:
        sim = jnp.where(valid0[:, None], sim, -jnp.inf)
    if valid1 is not None:
        sim = jnp.where(valid1[None, :], sim, -jnp.inf)
    nn01 = jnp.argmax(sim, axis=1)
    nn10 = jnp.argmax(sim, axis=0)
    scores = jnp.take_along_axis(sim, nn01[:, None], axis=1)[:, 0]
    mutual = jnp.arange(desc0.shape[0]) == nn10[nn01]
    ok = mutual & (scores > threshold) & jnp.isfinite(scores)
    return {
        "matches0": jnp.where(ok, nn01, -1),
        "scores0": jnp.where(ok, scores, 0.0),
    }


register_model("matcher_nn", {"threshold": 0.0})(
    lambda threshold=0.0: (
        lambda f0, f1: mutual_nearest_neighbor(
            f0["descriptors"], f1["descriptors"], threshold
        )
    )
)


def rotary_encode(x: jax.Array, kpts: jax.Array, num_heads: int) -> jax.Array:
    """LightGlue-style 2D rotary positional encoding of attention features.

    x: [N, D]; kpts: [N, 2] normalized to [-1, 1]. Rotates feature pairs by
    angles proportional to keypoint coordinates.
    """
    n, d = x.shape
    half = d // 2
    freqs = 2.0 ** jnp.arange(half // 2, dtype=jnp.float32)  # geometric bands
    ang = kpts[:, :1] * freqs[None] * jnp.pi  # x bands [N, half/2]
    ang = jnp.concatenate([ang, kpts[:, 1:2] * freqs[None] * jnp.pi], axis=-1)  # [N, half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[:, :half], x[:, half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
