"""SuperPoint keypoint detector + descriptor (flax.linen, channel-last).

Architecture parity with the reference's runtime keypoint source (the pip
``lightglue`` SuperPoint used at comet/models/train_eval_func_new_cp5.py:527
and the vendored gluefactory_nonfree/superpoint.py): shared VGG-style
encoder, a 65-channel detector head (8x8 cells + dustbin) and a 256-d
descriptor head. The torch->flax converter can port MagicLeap weights; the
keypoint extraction (NMS, threshold, top-k) is implemented as static-shape
jnp so the whole detector jits.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SuperPointOutput(NamedTuple):
    keypoints: jax.Array  # [K, 2] (x, y) pixels
    scores: jax.Array  # [K]
    descriptors: jax.Array  # [K, 256]


class SuperPointBackbone(nn.Module):
    """VGG encoder + detector/descriptor heads; input [B, H, W, 1] grayscale
    in [0, 1]; H, W multiples of 8."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        def conv(x, ch, name, k=3):
            pad = ((k // 2, k // 2), (k // 2, k // 2))
            return nn.Conv(ch, (k, k), padding=pad, dtype=self.dtype, name=name)(x)

        def pool(x):
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        x = nn.relu(conv(x, 64, "conv1a"))
        x = nn.relu(conv(x, 64, "conv1b"))
        x = pool(x)
        x = nn.relu(conv(x, 64, "conv2a"))
        x = nn.relu(conv(x, 64, "conv2b"))
        x = pool(x)
        x = nn.relu(conv(x, 128, "conv3a"))
        x = nn.relu(conv(x, 128, "conv3b"))
        x = pool(x)
        x = nn.relu(conv(x, 128, "conv4a"))
        x = nn.relu(conv(x, 128, "conv4b"))

        # detector head: 65 = 8*8 cell positions + dustbin
        cpa = nn.relu(conv(x, 256, "convPa"))
        semi = nn.Conv(65, (1, 1), dtype=self.dtype, name="convPb")(cpa)

        # descriptor head
        cda = nn.relu(conv(x, 256, "convDa"))
        desc = nn.Conv(256, (1, 1), dtype=self.dtype, name="convDb")(cda)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc.astype(jnp.float32), axis=-1, keepdims=True), 1e-8
        ).astype(desc.dtype)
        return semi, desc


def scores_from_semi(semi: jax.Array) -> jax.Array:
    """[B, H/8, W/8, 65] -> dense keypoint heatmap [B, H, W]."""
    probs = jax.nn.softmax(semi, axis=-1)[..., :64]  # drop dustbin
    b, hc, wc, _ = probs.shape
    probs = probs.reshape(b, hc, wc, 8, 8)
    probs = probs.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)
    return probs


def simple_nms(scores: jax.Array, radius: int = 4) -> jax.Array:
    """Iterated max-pool NMS (gluefactory_nonfree superpoint semantics)."""
    size = 2 * radius + 1

    def max_pool(x):
        return nn.max_pool(
            x[..., None], (size, size), strides=(1, 1),
            padding=((radius, radius), (radius, radius)),
        )[..., 0]

    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(2):
        supp_mask = max_pool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


def extract_keypoints(
    heatmap: jax.Array,  # [H, W]
    max_keypoints: int = 512,
    threshold: float = 0.005,
    nms_radius: int = 4,
    border: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Static-shape top-k keypoint extraction -> ([K, 2] xy, [K] scores).

    Sub-threshold / border keypoints get score 0 (callers filter or let the
    padding logic in data.keypoints handle them)."""
    h, w = heatmap.shape
    s = simple_nms(heatmap[None], nms_radius)[0]
    # zero borders
    mask = jnp.zeros_like(s).at[border : h - border, border : w - border].set(1.0)
    s = s * mask
    s = jnp.where(s >= threshold, s, 0.0)
    flat = s.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_keypoints)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1), scores


def sample_descriptors(
    desc_map: jax.Array, keypoints: jax.Array, stride: int = 8
) -> jax.Array:
    """Bilinearly sample the coarse descriptor map at keypoint locations."""
    from ..ops import bilinear_sample

    pts = (keypoints - stride / 2 + 0.5) / stride
    d = bilinear_sample(desc_map, pts)
    return d / jnp.maximum(
        jnp.linalg.norm(d.astype(jnp.float32), axis=-1, keepdims=True), 1e-8
    ).astype(d.dtype)


class SuperPoint(nn.Module):
    """End-to-end detector: grayscale image -> keypoints/scores/descriptors."""

    max_keypoints: int = 512
    detection_threshold: float = 0.005
    nms_radius: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array) -> SuperPointOutput:
        """image: [H, W] or [H, W, 1] grayscale in [0, 1]."""
        if image.ndim == 2:
            image = image[..., None]
        semi, desc = SuperPointBackbone(dtype=self.dtype, name="backbone")(
            image[None]
        )
        heat = scores_from_semi(semi)[0]
        kps, scores = extract_keypoints(
            heat, self.max_keypoints, self.detection_threshold, self.nms_radius
        )
        descs = sample_descriptors(desc[0], kps)
        return SuperPointOutput(keypoints=kps, scores=scores, descriptors=descs)
