"""DISK keypoint detector + dense descriptor (flax.linen, channel-last).

Architecture parity with the reference's DISK extractor
(gluefactory/models/extractors/disk_kornia.py, which wraps
kornia.feature.DISK): a thin U-Net (kernel-5 conv blocks, PReLU gates,
instance norm, avg-pool down / nearest up, channel plan down
[16,32,64,64,64] -> up [64,64,64,desc_dim+1]) producing a dense
``desc_dim``-channel descriptor map plus a 1-channel keypoint heatmap at
FULL resolution — the reference crops the dense maps with ``[..., :h, :w]``
at image size (disk_kornia.py:36-37) and uses the heatmap pixel argmaxes
directly as image-space keypoints, so the up path must mirror all four
downsamples (the original DISK U-Net asserts len(down) == len(up) + 1),
followed by windowed-NMS keypoint selection
(kornia heatmap_to_keypoints: window_size=5, score threshold, top-n).

TPU notes: the whole network is plain channel-last convs (XLA fuses the
norm/gate chains); keypoint selection is the same static-shape
window-argmax used by the other extractors, so extraction jits end to
end. Inputs are padded to a multiple of 16 by the registry factory
(pad_if_not_divisible, disk_kornia.py:29-36).

No pretrained weights ship in this offline environment;
``convert_disk_state_dict`` maps kornia's ``unet.path_down/path_up``
tensor names onto this tree for when weights are available.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DISKOutput(NamedTuple):
    keypoints: jax.Array  # [K, 2] (x, y) pixels
    scores: jax.Array  # [K] heatmap logits at the keypoint
    descriptors: jax.Array  # [K, desc_dim] L2-normalized
    valid: jax.Array  # [K] bool — False for threshold-failed padding slots


class _ConvBlock(nn.Module):
    """norm -> conv5x5 -> PReLU (the thin-unet block; one conv per block)."""

    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # instance norm without affine (thin-unet default)
        mu = x.mean(axis=(-3, -2), keepdims=True)
        var = x.var(axis=(-3, -2), keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        x = nn.Conv(
            self.ch, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
            name="conv",
        )(x)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class DISKUnet(nn.Module):
    """Thin U-Net: len(down)-1 avg-pool downsamples, nearest upsamples with
    skip concatenation; returns the final up-path map [B, H, W, up[-1]]."""

    down: Sequence[int] = (16, 32, 64, 64, 64)
    up: Sequence[int] = (64, 64, 64, 129)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skips = []
        for i, ch in enumerate(self.down):
            if i > 0:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = _ConvBlock(ch, dtype=self.dtype, name=f"down_{i}")(x)
            skips.append(x)
        for j, ch in enumerate(self.up):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            skip = skips[len(self.down) - 2 - j]
            x = jnp.concatenate([x, skip], axis=-1)
            x = _ConvBlock(ch, dtype=self.dtype, name=f"up_{j}")(x)
        return x


def heatmap_to_keypoints(
    heatmap: jax.Array,  # [H, W] logits
    n: int,
    window_size: int = 5,
    score_threshold: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """kornia disk.detector.heatmap_to_keypoints as static-shape jnp:
    windowed NMS (a pixel survives iff it is the max of its
    window_size-window) -> threshold -> top-n. Returns (kpts [n,2] xy,
    scores [n], valid [n])."""
    h, w = heatmap.shape
    r = window_size // 2
    local_max = nn.max_pool(
        heatmap[None, ..., None],
        (window_size, window_size),
        strides=(1, 1),
        padding=((r, r), (r, r)),
    )[0, ..., 0]
    is_peak = (heatmap >= local_max) & (heatmap > score_threshold)
    flat = jnp.where(is_peak, heatmap, -jnp.inf).reshape(-1)
    scores, idx = jax.lax.top_k(flat, n)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    valid = jnp.isfinite(scores)
    return jnp.stack([xs, ys], -1), jnp.where(valid, scores, 0.0), valid


class DISK(nn.Module):
    """Full extractor: U-Net -> split heatmap/descriptors -> NMS top-k ->
    per-keypoint L2-normalized descriptors (disk_kornia.py:26-49
    heatmap_and_dense_descriptors + heatmap_to_keypoints +
    merge_with_descriptors)."""

    desc_dim: int = 128
    max_keypoints: int = 512
    nms_window_size: int = 5
    detection_threshold: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array) -> DISKOutput:
        """image: [B, H, W, 3] in [0, 1], H and W multiples of 16."""
        unet = DISKUnet(
            up=(64, 64, 64, self.desc_dim + 1), dtype=self.dtype, name="unet"
        )
        out = unet(image.astype(self.dtype))
        descs = out[..., : self.desc_dim]
        heat = out[..., self.desc_dim].astype(jnp.float32)

        def one(hm, dm):
            kpts, scores, valid = heatmap_to_keypoints(
                hm, self.max_keypoints, self.nms_window_size,
                self.detection_threshold,
            )
            xi = kpts[:, 0].astype(jnp.int32)
            yi = kpts[:, 1].astype(jnp.int32)
            d = dm[yi, xi].astype(jnp.float32)
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
            return kpts, scores, d, valid

        kpts, scores, descs, valid = jax.vmap(one)(heat, descs)
        return DISKOutput(
            keypoints=kpts, scores=scores, descriptors=descs, valid=valid
        )


def convert_disk_state_dict(state_dict, template_params):
    """Map kornia DISK tensors (unet.path_down.N..., unet.path_up.N...)
    onto this module tree. Conv kernels transpose OIHW -> HWIO; PReLU
    weights map 1:1. Unmatched template leaves (none expected) are left
    at init."""
    import numpy as np

    params = jax.tree_util.tree_map(lambda x: np.array(x), template_params)

    def put(path, val):
        node = params["params"]
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == val.shape, (
            path, node[path[-1]].shape, val.shape)
        node[path[-1]] = val

    for k, v in state_dict.items():
        v = np.asarray(v)
        parts = k.split(".")
        if "path_down" in parts:
            i = int(parts[parts.index("path_down") + 1])
            block = ("unet", f"down_{i}")
        elif "path_up" in parts:
            i = int(parts[parts.index("path_up") + 1])
            block = ("unet", f"up_{i}")
        else:
            continue
        if parts[-1] == "weight" and v.ndim == 4:
            put(block + ("conv", "kernel"), v.transpose(2, 3, 1, 0))
        elif parts[-1] == "bias":
            put(block + ("conv", "bias"), v)
        elif v.ndim <= 1:  # PReLU alpha
            put(block + ("prelu_alpha",), v.reshape(1))
    return params
