"""Keypoint patch extraction + heatmap composition utilities.

Parity surface: ``gluefactory/utils/patches.py`` (extract_patches:4,
batch_extract_patches:26, draw_image_patches:37, build_heatmap:46). The
reference loops per-batch-element and writes patches in place; here the
extraction is one batched advanced-indexing gather (a single XLA gather
kernel), and the drawing helpers are host-side numpy (they exist for
visualization/debugging, not for the compute path).

Layout follows the reference: images are channel-first [C, H, W] /
[B, C, H, W], patches come back [N, C, ps, ps], corners are (x, y).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def extract_patches(
    image: jax.Array, required_corners: jax.Array, ps: int
) -> Tuple[jax.Array, jax.Array]:
    """Extract ``ps``x``ps`` patches with top-left corners at integer (x, y).

    image: [C, H, W]; required_corners: [N, 2] float (x, y).
    Returns (patches [N, C, ps, ps], corners [N, 2] float).

    Corner clamp matches the reference exactly (utils/patches.py:10-12):
    truncation toward zero, then clip to [0, dim - 1 - ps] — note the
    reference's off-by-one-conservative upper bound (``- 1 - ps``, not
    ``- ps``), preserved so converted pipelines see identical corners.
    """
    c, h, w = image.shape
    corner = required_corners.astype(jnp.int32)
    corner = jnp.stack(
        [
            jnp.clip(corner[:, 0], 0, w - 1 - ps),
            jnp.clip(corner[:, 1], 0, h - 1 - ps),
        ],
        axis=-1,
    )  # [N, 2] (x, y)
    off = jnp.arange(ps)
    yy = corner[:, 1, None, None] + off[None, :, None]  # [N, ps, 1]
    xx = corner[:, 0, None, None] + off[None, None, :]  # [N, 1, ps]
    # one gather: [N, ps, ps, C] -> [N, C, ps, ps]
    patches = image.transpose(1, 2, 0)[yy, xx]
    return patches.transpose(0, 3, 1, 2), corner.astype(jnp.float32)


def batch_extract_patches(
    images: jax.Array, kpts: jax.Array, ps: int
) -> Tuple[jax.Array, jax.Array]:
    """Patches centered on keypoints, batched.

    images: [B, C, H, W]; kpts: [B, N, 2] (x, y). Top-left corner is
    ``kpt - ps/2 - 1`` (reference utils/patches.py:33). Returns
    (patches [B, N, C, ps, ps], corners [B, N, 2]).
    """
    fn = jax.vmap(lambda im, kp: extract_patches(im, kp - ps / 2 - 1, ps))
    return fn(images, kpts)


def draw_image_patches(
    img: np.ndarray, patches: np.ndarray, corners: np.ndarray
) -> None:
    """Paste patches back into ``img`` in place (host-side, numpy).

    img: [B, C, H, W]; patches: [B, N, C, ps, ps]; corners: [B, N, 2] (x, y).
    Reference: utils/patches.py:37-43.
    """
    b, n = patches.shape[:2]
    ps = patches.shape[-1]
    for i in range(b):
        for k in range(n):
            x, y = int(corners[i, k, 0]), int(corners[i, k, 1])
            img[i, :, y : y + ps, x : x + ps] = patches[i, k]


def build_heatmap(
    img: np.ndarray, patches: np.ndarray, corners: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Compose a patch-coverage heatmap and its binary mask.

    Returns (heatmap [B, H, W] after squeezing a single channel, mask
    ``heatmap > 0``). Reference: utils/patches.py:46-50.
    """
    hmap = np.zeros_like(np.asarray(img))
    draw_image_patches(hmap, np.asarray(patches), np.asarray(corners))
    # torch's .squeeze(1) is a silent no-op for C>1; only drop a singleton
    # channel so multi-channel images keep [B, C, H, W] like the reference
    if hmap.ndim >= 2 and hmap.shape[1] == 1:
        hmap = hmap.squeeze(1)
    return hmap, (hmap > 0.0).astype(np.float32)
