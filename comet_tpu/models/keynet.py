"""KeyNet detector + HardNet descriptor (flax.linen, channel-last).

Architecture parity with the reference's KeyNetAffNetHardNet extractor
(gluefactory/models/extractors/keynet_affnet_hardnet.py, wrapping
kornia.feature.KeyNetHardNet):

- **KeyNet** (Barroso-Laguna et al. ICCV'19): a handcrafted filter bank
  (1st/2nd-order derivatives and their products: gx, gy, gx^2, gy^2,
  gx*gy, gxx, gyy, gxy, gxx*gyy, and (gx*gy)^2 — 10 channels) feeding a
  learned 3-layer conv block (5x5, 8 channels, BN+ReLU) and a final 1x1
  score conv, evaluated over an L-level scale pyramid (factor 1.2); the
  per-level score maps are upsampled to full resolution and summed. NMS
  + top-k selects keypoints.
- **HardNet** (Mishchuk et al. NeurIPS'17): 32x32 patches around each
  keypoint through 7 convs (BN, ReLU, no bias until the last), final
  128-d descriptor L2-normalized.
- The reference's AffNet affine-shape and orientation estimation steps
  are reduced to upright unit-scale patches (the wrapper's
  ``upright=True`` mode, keynet_affnet_hardnet.py:22); `scales`/`oris`
  outputs are therefore constant.

TPU notes: the handcrafted filters are fixed depthwise convs (XLA folds
them); patch extraction reuses ops.corr.extract_patches (blocked gather);
everything is static-shape so the full extractor jits.

No pretrained weights ship offline; kornia state dicts map through
``convert_keynet_state_dict`` / ``convert_hardnet_state_dict``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class KeyNetOutput(NamedTuple):
    keypoints: jax.Array  # [K, 2] (x, y) pixels
    scores: jax.Array  # [K]
    descriptors: jax.Array  # [K, 128]
    valid: jax.Array  # [K] bool
    scales: jax.Array  # [K] (constant 1.0 — upright/unit-scale mode)
    oris: jax.Array  # [K] (constant 0.0)


def _sobel_kernels(dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    gx = jnp.asarray(
        [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype) / 8.0
    return gx, gx.T


def handcrafted_block(x: jax.Array) -> jax.Array:
    """[B, H, W, 1] -> [B, H, W, 10] derivative feature bank
    (kornia keynet._HandcraftedBlock)."""

    def dconv(x, k):
        return jax.lax.conv_general_dilated(
            x, k[..., None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    kx, ky = _sobel_kernels(x.dtype)
    gx = dconv(x, kx)
    gy = dconv(x, ky)
    gxx = dconv(gx, kx)
    gyy = dconv(gy, ky)
    gxy = dconv(gx, ky)
    return jnp.concatenate(
        [gx, gy, gx * gx, gy * gy, gx * gy, gxx, gyy, gxy,
         gxx * gyy, (gx * gy) ** 2],
        axis=-1,
    )


class KeyNetLearned(nn.Module):
    """3x (conv5x5 -> BN(inference stats) -> ReLU) + 1x1 score conv
    (kornia keynet._LearnedBlock + final)."""

    ch: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(
                self.ch, (5, 5), padding=((2, 2), (2, 2)), use_bias=False,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=True, dtype=self.dtype, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="score")(x)


class HardNet(nn.Module):
    """32x32 patch -> 128-d descriptor; the canonical 7-conv HardNet
    (kornia.feature.HardNet layer plan: 32,32,64,64,128,128 + final 8x8
    conv to 128, BN throughout, input patch-normalized)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array) -> jax.Array:
        """patches: [N, 32, 32, 1]."""
        x = patches.astype(jnp.float32)
        mu = x.mean(axis=(1, 2, 3), keepdims=True)
        sd = x.std(axis=(1, 2, 3), keepdims=True)
        x = ((x - mu) / (sd + 1e-7)).astype(self.dtype)
        plan = [(32, 1), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1)]
        for i, (ch, stride) in enumerate(plan):
            x = nn.Conv(
                ch, (3, 3), strides=stride, padding=((1, 1), (1, 1)),
                use_bias=False, dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=True, dtype=self.dtype, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        # final 8x8 valid conv -> [N, 1, 1, 128]
        x = nn.Conv(
            128, (8, 8), padding="VALID", use_bias=False, dtype=self.dtype,
            name="conv6",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, dtype=self.dtype, name="bn6"
        )(x)
        d = x.reshape(x.shape[0], 128).astype(jnp.float32)
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


class KeyNetHardNet(nn.Module):
    """Full extractor: multi-scale KeyNet score -> NMS top-k -> HardNet
    descriptors on upright 32x32 patches."""

    max_keypoints: int = 512
    num_levels: int = 3
    scale_factor: float = 1.2
    nms_radius: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array) -> KeyNetOutput:
        """image: [H, W] or [H, W, {1,3}] grayscale/RGB in [0, 1]."""
        if image.ndim == 2:
            image = image[..., None]
        if image.shape[-1] == 3:
            w = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            image = (image * w).sum(-1, keepdims=True)
        h, w_px = image.shape[:2]
        x0 = image[None].astype(self.dtype)

        learned = KeyNetLearned(dtype=self.dtype, name="learned")
        total = jnp.zeros((1, h, w_px, 1), jnp.float32)
        cur = x0
        for lvl in range(self.num_levels):
            if lvl > 0:
                nh = max(int(round(h / self.scale_factor**lvl)), 8)
                nw = max(int(round(w_px / self.scale_factor**lvl)), 8)
                cur = jax.image.resize(x0, (1, nh, nw, 1), "linear")
            feats = handcrafted_block(cur)
            score = learned(feats)
            total = total + jax.image.resize(
                score.astype(jnp.float32), (1, h, w_px, 1), "linear"
            )

        heat = nn.relu(total[0, ..., 0])
        r = self.nms_radius
        local_max = nn.max_pool(
            heat[None, ..., None], (2 * r + 1, 2 * r + 1), strides=(1, 1),
            padding=((r, r), (r, r)),
        )[0, ..., 0]
        is_peak = (heat >= local_max) & (heat > 0)
        flat = jnp.where(is_peak, heat, -jnp.inf).reshape(-1)
        scores, idx = jax.lax.top_k(flat, self.max_keypoints)
        ys = (idx // w_px).astype(jnp.float32)
        xs = (idx % w_px).astype(jnp.float32)
        valid = jnp.isfinite(scores)
        scores = jnp.where(valid, scores, 0.0)
        kpts = jnp.stack([xs, ys], -1)

        # upright 32x32 patches (AffNet reduced to identity shape)
        from ..ops.corr import extract_patches

        topleft = jnp.clip(
            kpts.astype(jnp.int32) - 16,
            0, jnp.asarray([w_px - 32, h - 32], jnp.int32),
        )
        patches = extract_patches(
            image[None].astype(jnp.float32), topleft[None], 32
        )[0]  # [K, 32, 32, 1]
        descs = HardNet(dtype=self.dtype, name="hardnet")(patches)
        k = self.max_keypoints
        return KeyNetOutput(
            keypoints=kpts, scores=scores, descriptors=descs, valid=valid,
            scales=jnp.ones((k,), jnp.float32),
            oris=jnp.zeros((k,), jnp.float32),
        )


def convert_hardnet_state_dict(state_dict, template_params):
    """kornia HardNet ``features.N.{weight,running_mean,...}`` tensors ->
    HardNet ``conv{i}``/``bn{i}``. kornia's Sequential indexes convs at
    0,3,6,9,12,15,18 and batchnorms at 1,4,7,10,13,16,19 (ReLU between);
    conv kernels transpose OIHW -> HWIO, BN running stats land in
    batch_stats."""
    params = jax.tree_util.tree_map(np.array, template_params)
    conv_idx = [0, 3, 6, 9, 12, 15, 18]
    bn_idx = [1, 4, 7, 10, 13, 16, 19]

    def put(section, path, val):
        node = params[section]
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == val.shape, (
            path, node[path[-1]].shape, val.shape)
        node[path[-1]] = val

    for k, v in state_dict.items():
        v = np.asarray(v)
        parts = k.split(".")
        if parts[0] != "features":
            continue
        i = int(parts[1])
        leaf = parts[-1]
        if i in conv_idx and leaf == "weight":
            put("params", (f"conv{conv_idx.index(i)}", "kernel"),
                v.transpose(2, 3, 1, 0))
        elif i in bn_idx:
            j = bn_idx.index(i)
            if leaf == "weight":
                put("params", (f"bn{j}", "scale"), v)
            elif leaf == "bias":
                put("params", (f"bn{j}", "bias"), v)
            elif leaf == "running_mean":
                put("batch_stats", (f"bn{j}", "mean"), v)
            elif leaf == "running_var":
                put("batch_stats", (f"bn{j}", "var"), v)
    return params
