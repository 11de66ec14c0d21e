"""DeepLSD-equivalent: a CNN predicts line attraction fields (distance to
the nearest line + line-level angle), and segments are extracted by the
same static-shape anchor-marching core as the LSD-equivalent detector.

Parity target: gluefactory/models/lines/deeplsd.py, which wraps the DeepLSD
package — a UNet backbone regressing (df, line_level) fields and a
traditional-LSD extraction pass over a surrogate gradient image derived
from those fields. Here the backbone is an original flax encoder-decoder
and extraction reuses matching/lines.march_segments_from_fields with

    mag   = exp(-df / tau)          (strong near predicted lines)
    theta = angle + pi/2            (marching needs the line NORMAL)

which is exactly the surrogate-image trick expressed TPU-natively (no
region growing, fixed shapes, everything jits). Weightless-capable like
the other in-repo extractors: with random weights the fields are noise but
every shape/jit contract holds; training supervises (df, angle) directly.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .lines import LineSegments, march_segments_from_fields
from .registry import register_model


class _ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(x)
        return nn.relu(x)


class DeepLSDNet(nn.Module):
    """Encoder-decoder predicting the two attraction fields.

    Returns {"df": [H, W] >= 0 distance field,
             "angle": [H, W] in [0, pi) line-level orientation}.
    """

    base: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, gray: jax.Array) -> Dict[str, jax.Array]:
        # single-image contract: [H, W] or [H, W, C] (the heads below read
        # batch entry 0; vmap for batches)
        assert gray.ndim in (2, 3), f"expected [H, W](, C), got {gray.shape}"
        x = gray[..., None] if gray.ndim == 2 else gray
        x = x[None]  # [1, H, W, C]

        e1 = _ConvBlock(self.base, self.dtype, name="enc1")(x)
        d1 = nn.max_pool(e1, (2, 2), strides=(2, 2))
        e2 = _ConvBlock(self.base * 2, self.dtype, name="enc2")(d1)
        d2 = nn.max_pool(e2, (2, 2), strides=(2, 2))
        b = _ConvBlock(self.base * 4, self.dtype, name="bottleneck")(d2)

        u2 = jax.image.resize(b, e2.shape[:-1] + (b.shape[-1],), "bilinear")
        u2 = _ConvBlock(self.base * 2, self.dtype, name="dec2")(
            jnp.concatenate([u2, e2], axis=-1)
        )
        u1 = jax.image.resize(u2, e1.shape[:-1] + (u2.shape[-1],), "bilinear")
        u1 = _ConvBlock(self.base, self.dtype, name="dec1")(
            jnp.concatenate([u1, e1], axis=-1)
        )

        # df head: softplus keeps it nonnegative; angle head: the network
        # predicts (cos 2a, sin 2a) so the pi-periodicity of line
        # orientation is built in (atan2 halved)
        df = nn.softplus(
            nn.Conv(1, (1, 1), dtype=self.dtype, name="df_head")(u1)
        )[0, :, :, 0]
        ab = nn.Conv(2, (1, 1), dtype=self.dtype, name="angle_head")(u1)[0]
        # stop_gradient around the atan2 decode: its gradient blows up when
        # the vector head passes near the origin; training supervises the
        # raw (cos 2a, sin 2a) vector ("angle_vec") instead
        angle = 0.5 * jnp.arctan2(
            jax.lax.stop_gradient(ab[:, :, 1]),
            jax.lax.stop_gradient(ab[:, :, 0]),
        )  # [-pi/2, pi/2)
        angle = jnp.where(angle < 0, angle + jnp.pi, angle)  # [0, pi)
        return {"df": df, "angle": angle, "angle_vec": ab}


def extract_lines_from_fields(
    df: jax.Array,  # [H, W] distance-to-line field
    angle: jax.Array,  # [H, W] line-level orientation in [0, pi)
    tau: float = 1.5,
    max_lines: int = 64,
    **march_kw,
) -> LineSegments:
    """DeepLSD extraction: surrogate edge strength exp(-df/tau), normals
    perpendicular to the predicted line orientation."""
    mag = jnp.exp(-df / tau)
    theta = angle + jnp.pi / 2.0  # marching expects the gradient/normal
    kw = dict(mag_threshold=0.3, angle_tol=0.4)
    kw.update(march_kw)
    return march_segments_from_fields(mag, theta, max_lines=max_lines, **kw)


def deeplsd_field_loss(
    pred: Dict[str, jax.Array],
    gt_df: jax.Array,
    gt_angle: jax.Array,
    df_clip: float = 5.0,
) -> jax.Array:
    """DeepLSD training loss: L1 on the (clipped, normalized) distance
    field + pi-periodic angular loss weighted toward pixels near lines.

    The angular term supervises the raw (cos 2a, sin 2a) vector head —
    gradients stay finite everywhere (atan2's don't near the origin)."""
    p_df = jnp.clip(pred["df"], 0.0, df_clip) / df_clip
    g_df = jnp.clip(gt_df, 0.0, df_clip) / df_clip
    l_df = jnp.abs(p_df - g_df).mean()
    w = jnp.exp(-gt_df / df_clip)  # angle supervision matters near lines
    ab = pred["angle_vec"]
    abn = ab / jnp.sqrt((ab * ab).sum(-1, keepdims=True) + 1e-6)
    gt_vec = jnp.stack(
        [jnp.cos(2.0 * gt_angle), jnp.sin(2.0 * gt_angle)], axis=-1
    )
    l_ang = (w * ((abn - gt_vec) ** 2).sum(-1)).sum() / jnp.maximum(
        w.sum(), 1e-6
    )
    return l_df + l_ang


class DeepLSDDetector:
    """Callable bundling net + extraction (the registry-facing object)."""

    def __init__(self, base=32, tau=1.5, max_lines=64, **march_kw):
        self.net = DeepLSDNet(base=base)
        self.tau = tau
        self.max_lines = max_lines
        self.march_kw = march_kw
        self.params = None

    def init(self, key, gray):
        self.params = self.net.init(key, gray)
        return self.params

    def __call__(self, gray, params=None) -> LineSegments:
        p = params if params is not None else self.params
        fields = self.net.apply(p, gray)
        return extract_lines_from_fields(
            fields["df"], fields["angle"], tau=self.tau,
            max_lines=self.max_lines, **self.march_kw,
        )


register_model("lines_deeplsd", {"base": 32, "tau": 1.5, "max_lines": 64})(
    DeepLSDDetector
)
