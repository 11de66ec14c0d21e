"""Feature matchers: mutual nearest-neighbor and a LightGlue-style
transformer matcher (flax).

Parity targets: gluefactory's NN matcher and LightGlue
(gluefactory/models/matchers/lightglue.py, 612 LoC): L self+cross attention
layers over both keypoint sets with rotary positional encoding from
keypoint locations, followed by a dual-softmax assignment with learned
matchability. Static shapes (padded keypoint sets + validity masks) so the
matcher jits.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.blocks import gelu
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


class GlueAttention(nn.Module):
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, x_kpts=None, ctx_kpts=None, mask=None):
        d = x.shape[-1]
        q = nn.Dense(d, dtype=self.dtype, name="q")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k")(context)
        v = nn.Dense(d, dtype=self.dtype, name="v")(context)
        if x_kpts is not None:
            q = rotary_encode(q, x_kpts, self.num_heads)
        if ctx_kpts is not None:
            k = rotary_encode(k, ctx_kpts, self.num_heads)
        h = self.num_heads
        hd = d // h
        qh = q.reshape(-1, h, hd)
        kh = k.reshape(-1, h, hd)
        vh = v.reshape(-1, h, hd)
        logits = jnp.einsum("qhd,khd->hqk", qh / jnp.sqrt(hd), kh,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = jnp.where(mask[None, None, :], logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("hqk,khd->qhd", w, vh).reshape(-1, d)
        merged = jnp.concatenate([x, out], axis=-1)
        y = nn.Dense(2 * d, dtype=self.dtype, name="ffn1")(merged)
        y = gelu(y)
        y = nn.Dense(d, dtype=self.dtype, name="ffn2")(y)
        return x + y


class LightGlueMatcher(nn.Module):
    """Compact LightGlue: L layers of (self, cross) attention on both sets +
    dual-softmax assignment with matchability gates."""

    depth: int = 9
    dim: int = 256
    num_heads: int = 4
    filter_threshold: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        kpts0: jax.Array,  # [N0, 2] normalized to [-1, 1]
        desc0: jax.Array,  # [N0, D_in]
        kpts1: jax.Array,
        desc1: jax.Array,
        valid0: Optional[jax.Array] = None,
        valid1: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        x0 = nn.Dense(self.dim, dtype=self.dtype, name="input_proj")(desc0)
        x1 = nn.Dense(self.dim, dtype=self.dtype, name="input_proj_1")(desc1)
        v0 = valid0 if valid0 is not None else jnp.ones(x0.shape[0], bool)
        v1 = valid1 if valid1 is not None else jnp.ones(x1.shape[0], bool)

        for i in range(self.depth):
            x0 = GlueAttention(self.num_heads, dtype=self.dtype, name=f"self0_{i}")(
                x0, x0, kpts0, kpts0, mask=v0
            )
            x1 = GlueAttention(self.num_heads, dtype=self.dtype, name=f"self1_{i}")(
                x1, x1, kpts1, kpts1, mask=v1
            )
            x0n = GlueAttention(self.num_heads, dtype=self.dtype, name=f"cross0_{i}")(
                x0, x1, mask=v1
            )
            x1 = GlueAttention(self.num_heads, dtype=self.dtype, name=f"cross1_{i}")(
                x1, x0, mask=v0
            )
            x0 = x0n

        f0 = nn.Dense(self.dim, dtype=self.dtype, name="final_proj")(x0)
        f1 = nn.Dense(self.dim, dtype=self.dtype, name="final_proj_1")(x1)
        sim = jnp.einsum("nd,md->nm", f0, f1, preferred_element_type=jnp.float32)
        sim = sim / jnp.sqrt(self.dim)
        sim = jnp.where(v0[:, None] & v1[None, :], sim, -1e9)

        # matchability gates
        m0 = jax.nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="match0")(x0))[:, 0]
        m1 = jax.nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="match1")(x1))[:, 0]

        # dual softmax scores
        p = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=0)
        scores = p * m0[:, None] * m1[None, :]

        nn01 = jnp.argmax(scores, axis=1)
        nn10 = jnp.argmax(scores, axis=0)
        best = jnp.take_along_axis(scores, nn01[:, None], axis=1)[:, 0]
        mutual = jnp.arange(x0.shape[0]) == nn10[nn01]
        ok = mutual & (best > self.filter_threshold) & v0
        return {
            "matches0": jnp.where(ok, nn01, -1),
            "scores0": jnp.where(ok, best, 0.0),
            "assignment": scores,  # soft assignment, used by the NLL loss
            "matchability0": m0,
            "matchability1": m1,
        }


register_model(
    "matcher_lightglue",
    {"depth": 9, "dim": 256, "num_heads": 4, "filter_threshold": 0.1},
)(LightGlueMatcher)
