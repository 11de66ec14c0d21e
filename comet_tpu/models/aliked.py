"""ALIKED keypoint detector + deformable descriptor head (flax, channel-last).

Architecture parity target: /root/reference/gluefactory/models/extractors/
aliked.py (788 LoC) — ConvBlock/ResBlock encoder with deformable convs in
stages 3-4, 4-scale feature aggregation, sigmoid score head, DKD
differentiable keypoint detection (NMS + soft-argmax sub-pixel), and the
SDDH sparse deformable descriptor head. Pretrained ALIKED weights are not
downloadable in this environment; the module is weightless-capable (random
init) and `ALIKED_TORCH_MAP` gives the converter mapping for real
checkpoints (like the SuperPoint port, models/superpoint.py).

TPU-first design decisions (vs the CUDA original):

- **Deformable conv as gather + one contraction.** torchvision's
  `deform_conv2d` CUDA kernel becomes K*K bilinear gathers of the
  (small, stride-8/32) feature map followed by a single
  ``[B*H*W, K*K*C] x [K*K*C, C_out]`` matmul — MXU-shaped, no scatter.
- **Static-shape DKD.** The reference returns a ragged python list of
  keypoints per image (threshold mode). Here detection is top-K with a
  validity mask (score > threshold), so the whole extractor jits once.
- **SDDH without per-image python loops.** Patch extraction reuses the
  tracker's batched patch gather (ops/corr.extract_patches_ex); offsets,
  deformable sampling, and the per-position aggregation matmul
  (``ncp,pcd->nd``) are batched over all N keypoints at once.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.bilinear import sample_features

# c1, c2, c3, c4, dim, K (sddh kernel), M (sddh n_pos) — aliked.py:600-637
ALIKED_CFGS = {
    "aliked-t16": dict(c1=8, c2=16, c3=32, c4=64, dim=64, k=3, m=16),
    "aliked-n16": dict(c1=16, c2=32, c3=64, c4=128, dim=128, k=3, m=16),
    "aliked-n16rot": dict(c1=16, c2=32, c3=64, c4=128, dim=128, k=3, m=16),
    "aliked-n32": dict(c1=16, c2=32, c3=64, c4=128, dim=128, k=3, m=32),
}


class ALIKEDOutput(NamedTuple):
    keypoints: jax.Array  # [B, N, 2] (x, y) pixels
    scores: jax.Array  # [B, N]
    descriptors: jax.Array  # [B, N, dim]
    valid: jax.Array  # [B, N] bool (score > detection threshold)
    dispersity: jax.Array  # [B, N] sub-pixel score dispersity
    score_map: jax.Array  # [B, H, W]


def _conv(x, ch, k, name, bias=True):
    pad = ((k // 2, k // 2),) * 2 if k > 1 else "VALID"
    return nn.Conv(ch, (k, k), padding=pad, use_bias=bias, name=name)(x)


def _bn(x, name, train=False):
    return nn.BatchNorm(use_running_average=not train, name=name)(x)


def deform_conv2d(
    x: jax.Array,  # [B, H, W, C]
    offsets: jax.Array,  # [B, H, W, 2*K*K] torchvision layout: per tap (dy, dx)
    kernel: jax.Array,  # [K, K, C, C_out]
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """`torchvision.ops.deform_conv2d` semantics (stride 1, pad K//2,
    zero padding outside) as bilinear gathers + one MXU contraction.

    Offset channel layout matches torchvision: for tap t = i*K + j the
    channels are ``(2t, 2t+1) = (dy, dx)``; sampling position for output
    pixel (h, w) is ``(h - K//2 + i + dy, w - K//2 + j + dx)``.
    """
    b, h, w, c = x.shape
    kh, kw, _, cout = kernel.shape
    pad = kh // 2
    off = offsets.reshape(b, h, w, kh * kw, 2)
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=x.dtype), jnp.arange(w, dtype=x.dtype), indexing="ij"
    )
    ky, kx = jnp.meshgrid(
        jnp.arange(kh, dtype=x.dtype) - pad,
        jnp.arange(kw, dtype=x.dtype) - pad,
        indexing="ij",
    )
    # [H, W, K*K] absolute sample positions per tap
    py = gy[..., None] + ky.reshape(-1) + off[..., 0]
    px = gx[..., None] + kx.reshape(-1) + off[..., 1]
    pts = jnp.stack([px, py], axis=-1).reshape(b, h * w * kh * kw, 2)
    sampled = sample_features(x, pts, padding_mode="zeros")
    sampled = sampled.reshape(b, h * w, kh * kw * c)
    out = sampled @ kernel.reshape(kh * kw * c, cout)
    if bias is not None:
        out = out + bias
    return out.reshape(b, h, w, cout)


class DeformableConv2d(nn.Module):
    """aliked.py:267-324: a regular conv predicts per-pixel tap offsets,
    clamped to +-max(H, W)/4, driving the deformable 3x3 conv."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        off = _conv(x, 2 * k * k, k, "offset_conv", bias=True)
        max_off = max(x.shape[1], x.shape[2]) / 4.0
        off = jnp.clip(off, -max_off, max_off)
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        return deform_conv2d(x, off, w)


class ConvBlock(nn.Module):
    """conv-bn-selu x2 (aliked.py:384-410)."""

    features: int
    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x, train=False):
        for i in (1, 2):
            if self.conv_type == "dcn":
                x = DeformableConv2d(self.features, name=f"conv{i}")(x)
            else:
                x = _conv(x, self.features, 3, f"conv{i}", bias=False)
            x = nn.selu(_bn(x, f"bn{i}", train))
        return x


class ResBlock(nn.Module):
    """Basic residual block with 1x1 downsample projection and SELU gate
    (aliked.py:413-455)."""

    features: int
    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x, train=False):
        idn = nn.Conv(self.features, (1, 1), name="downsample")(x)
        for i, act in ((1, True), (2, False)):
            if self.conv_type == "dcn":
                x = DeformableConv2d(self.features, name=f"conv{i}")(x)
            else:
                x = _conv(x, self.features, 3, f"conv{i}", bias=False)
            x = _bn(x, f"bn{i}", train)
            if act:
                x = nn.selu(x)
        return nn.selu(x + idn)


def simple_nms(scores: jax.Array, radius: int) -> jax.Array:
    """Two-round local-max suppression (aliked.py:47-71), [B, H, W]."""

    def max_pool(x):
        k = radius * 2 + 1
        return nn.max_pool(
            x[..., None], (k, k), strides=(1, 1), padding=((radius,) * 2,) * 2
        )[..., 0]

    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(2):
        supp_mask = max_pool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


def dkd_detect(
    score_map: jax.Array,  # [B, H, W]
    max_keypoints: int,
    nms_radius: int = 2,
    temperature: float = 0.1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Differentiable keypoint detection (DKD.forward, aliked.py:74-243),
    static top-K formulation.

    Returns (keypoints_xy [B, N, 2] in pixels, scores [B, N],
    dispersity [B, N]). Sub-pixel refinement: soft-argmax over the
    (2r+1)^2 window with the reference's tuned temperature; the sampled
    score uses align_corners=True bilinear like the original grid_sample.
    """
    b, h, w = score_map.shape
    r = nms_radius
    nms = simple_nms(jax.lax.stop_gradient(score_map), r)
    # zero the border band (aliked.py:121-133)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    border = (ys < r) | (ys >= h - r) | (xs < r) | (xs >= w - r)
    nms = jnp.where(border, 0.0, nms)

    flat = nms.reshape(b, -1)
    top_scores, idx = jax.lax.top_k(flat, max_keypoints)  # [B, N]
    kx = (idx % w).astype(score_map.dtype)
    ky = (idx // w).astype(score_map.dtype)

    # windows around each keypoint from the (gradient-carrying) score map
    k = 2 * r + 1
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij"
    )
    wy = jnp.clip(ky[..., None].astype(jnp.int32) + dy.reshape(-1), 0, h - 1)
    wx = jnp.clip(kx[..., None].astype(jnp.int32) + dx.reshape(-1), 0, w - 1)
    patch = jax.vmap(lambda sm, yy, xx: sm[yy, xx])(score_map, wy, wx)
    # grid rows are (dx, dy) like hw_grid (aliked.py:98-104)
    grid = jnp.stack(
        [dx.reshape(-1), dy.reshape(-1)], axis=-1
    ).astype(score_map.dtype)

    x_exp = jnp.exp(
        (patch - jax.lax.stop_gradient(patch.max(-1, keepdims=True)))
        / temperature
    )
    denom = x_exp.sum(-1, keepdims=True)
    residual = (x_exp @ grid) / denom  # [B, N, 2] (dx, dy)
    dist2 = jnp.sum(
        ((grid[None, None] - residual[..., None, :]) / r) ** 2, axis=-1
    )
    dispersity = (x_exp * dist2).sum(-1) / denom[..., 0]

    kpts = jnp.stack([kx, ky], axis=-1) + residual  # [B, N, 2] pixels
    score = sample_features(score_map[..., None], kpts)[..., 0]
    return kpts, score, dispersity


def sddh_patch_corners(kpts: jax.Array, hw: Tuple[int, int], ps: int) -> jax.Array:
    """Reference get_patches corner rule (aliked.py:27-34): floor(kpt -
    ps/2 + 1) clamped to [0, size-1-ps] (the original's conservative
    off-by-one bound, kept for weight parity)."""
    h, w = hw
    corner = jnp.floor(kpts - ps / 2 + 1).astype(jnp.int32)
    return jnp.clip(
        corner, 0, jnp.asarray([w - 1 - ps, h - 1 - ps], jnp.int32)
    )


class SDDH(nn.Module):
    """Sparse deformable descriptor head (aliked.py:458-588).

    Per keypoint: a KxK feature patch -> offset conv (valid KxK + 1x1)
    predicts M sample positions; features sampled there pass a shared 1x1
    conv + SELU and are aggregated with the learned [M, C, C] weights.
    """

    dims: int
    kernel: int = 3
    n_pos: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, kpts: jax.Array) -> jax.Array:
        """x [B, H, W, C]; kpts [B, N, 2] pixel (x, y) -> [B, N, C]."""
        b, h, w, c = x.shape
        n = kpts.shape[1]
        ps, m = self.kernel, self.n_pos
        max_off = max(h, w) / 4.0

        if ps > 1:
            corners = sddh_patch_corners(kpts, (h, w), ps)
            lin = jnp.arange(ps)
            rows = corners[..., 1][..., None] + lin  # [B, N, ps]
            cols = corners[..., 0][..., None] + lin
            patch = jax.vmap(
                lambda img, rr, cc: img[
                    rr[:, :, None], cc[:, None, :]
                ]  # [N, ps, ps, C]
            )(x, rows, cols)
        else:
            pix = jnp.round(kpts).astype(jnp.int32)
            patch = jax.vmap(lambda img, p: img[p[:, 1], p[:, 0]])(x, pix)
            patch = patch.reshape(b, n, 1, 1, c)

        po = patch.reshape(b * n, ps, ps, c)
        po = nn.Conv(
            2 * m, (ps, ps), padding="VALID", use_bias=True, name="offset_conv1"
        )(po)
        po = nn.selu(po)
        po = nn.Conv(2 * m, (1, 1), use_bias=True, name="offset_conv2")(po)
        off = jnp.clip(po.reshape(b, n, 2 * m), -max_off, max_off)
        # channel layout (aliked.py:540-545): first M are x, last M are y
        off = jnp.stack([off[..., :m], off[..., m:]], axis=-1)  # [B, N, M, 2]

        pos = kpts[:, :, None, :] + off  # [B, N, M, 2] pixels
        feats = sample_features(x, pos.reshape(b, n * m, 2))
        feats = feats.reshape(b, n, m, c)
        feats = nn.selu(
            nn.Dense(self.dims, use_bias=False, name="sf_conv")(feats)
        )  # 1x1 conv == dense over C
        agg = self.param(
            "agg_weights",
            nn.initializers.uniform(scale=1.0),
            (m, self.dims, self.dims),
        )
        desc = jnp.einsum("bnmc,mcd->bnd", feats, agg)
        return desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
        )


class ALIKED(nn.Module):
    """Full extractor (aliked.py:591-785): 4-stage encoder (stages 3-4
    deformable), 4-scale aggregation to ``dim`` channels, score head,
    DKD detection, SDDH descriptors.

    Input [B, H, W, 3] in [0, 1], H and W multiples of 32 (the reference
    pads to /32; static shapes make padding the caller's one-liner).
    """

    model_name: str = "aliked-n16"
    max_keypoints: int = 512
    detection_threshold: float = 0.2
    nms_radius: int = 2

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> ALIKEDOutput:
        cfg = ALIKED_CFGS[self.model_name]
        c1, c2, c3, c4, dim = (
            cfg["c1"], cfg["c2"], cfg["c3"], cfg["c4"], cfg["dim"]
        )
        b, h, w, _ = image.shape

        x1 = ConvBlock(c1, "conv", name="block1")(image, train)
        x2 = nn.avg_pool(x1, (2, 2), strides=(2, 2))
        x2 = ResBlock(c2, "conv", name="block2")(x2, train)
        x3 = nn.avg_pool(x2, (4, 4), strides=(4, 4))
        x3 = ResBlock(c3, "dcn", name="block3")(x3, train)
        x4 = nn.avg_pool(x3, (4, 4), strides=(4, 4))
        x4 = ResBlock(c4, "dcn", name="block4")(x4, train)

        # per-scale 1x1 squeeze to dim/4 + bilinear upsample to full res
        # (align_corners=True, matching nn.Upsample(align_corners=True))
        from ..ops.bilinear import resize_bilinear_align_corners

        f1 = nn.selu(nn.Conv(dim // 4, (1, 1), use_bias=False, name="conv1")(x1))
        f2 = nn.selu(nn.Conv(dim // 4, (1, 1), use_bias=False, name="conv2")(x2))
        f3 = nn.selu(nn.Conv(dim // 4, (1, 1), use_bias=False, name="conv3")(x3))
        f4 = nn.selu(nn.Conv(dim // 4, (1, 1), use_bias=False, name="conv4")(x4))
        f2 = resize_bilinear_align_corners(f2, h, w)
        f3 = resize_bilinear_align_corners(f3, h, w)
        f4 = resize_bilinear_align_corners(f4, h, w)
        x1234 = jnp.concatenate([f1, f2, f3, f4], axis=-1)  # [B, H, W, dim]

        # score head (aliked.py:705-713)
        s = nn.selu(nn.Conv(8, (1, 1), name="score_head0")(x1234))
        s = nn.selu(_conv(s, 4, 3, "score_head2"))
        s = nn.selu(_conv(s, 4, 3, "score_head4"))
        s = _conv(s, 1, 3, "score_head6")
        score_map = jax.nn.sigmoid(s[..., 0])  # [B, H, W]
        feature_map = x1234 / jnp.maximum(
            jnp.linalg.norm(x1234, axis=-1, keepdims=True), 1e-8
        )

        kpts, scores, dispersity = dkd_detect(
            score_map, self.max_keypoints, self.nms_radius
        )
        desc = SDDH(dim, cfg["k"], cfg["m"], name="desc_head")(feature_map, kpts)
        return ALIKEDOutput(
            keypoints=kpts,
            scores=scores,
            descriptors=desc,
            valid=scores > self.detection_threshold,
            dispersity=dispersity,
            score_map=score_map,
        )


# torch state_dict prefix -> (flax param path prefix, kind) for the
# checkpoint converter; kind "conv" transposes OIHW->HWIO, "bn" maps
# weight/bias/running_mean/running_var -> scale/bias/mean/var, "raw"
# copies as-is. Offset convs inside DCN blocks live at
# `<block>.convN.offset_conv` in torch and `<block>/convN/offset_conv`
# here; the deformable kernel is `<block>.convN.regular_conv.weight` ->
# `<block>/convN/weight`.
ALIKED_TORCH_MAP: Dict[str, Tuple[str, str]] = {
    "block1.conv1": ("block1/conv1", "conv"),
    "block1.conv2": ("block1/conv2", "conv"),
    "block1.bn1": ("block1/bn1", "bn"),
    "block1.bn2": ("block1/bn2", "bn"),
    "block2.conv1": ("block2/conv1", "conv"),
    "block2.conv2": ("block2/conv2", "conv"),
    "block2.bn1": ("block2/bn1", "bn"),
    "block2.bn2": ("block2/bn2", "bn"),
    "block2.downsample": ("block2/downsample", "conv"),
    "block3.conv1.offset_conv": ("block3/conv1/offset_conv", "conv"),
    "block3.conv1.regular_conv": ("block3/conv1", "dcn_weight"),
    "block3.conv2.offset_conv": ("block3/conv2/offset_conv", "conv"),
    "block3.conv2.regular_conv": ("block3/conv2", "dcn_weight"),
    "block3.bn1": ("block3/bn1", "bn"),
    "block3.bn2": ("block3/bn2", "bn"),
    "block3.downsample": ("block3/downsample", "conv"),
    "block4.conv1.offset_conv": ("block4/conv1/offset_conv", "conv"),
    "block4.conv1.regular_conv": ("block4/conv1", "dcn_weight"),
    "block4.conv2.offset_conv": ("block4/conv2/offset_conv", "conv"),
    "block4.conv2.regular_conv": ("block4/conv2", "dcn_weight"),
    "block4.bn1": ("block4/bn1", "bn"),
    "block4.bn2": ("block4/bn2", "bn"),
    "block4.downsample": ("block4/downsample", "conv"),
    "conv1": ("conv1", "conv"),
    "conv2": ("conv2", "conv"),
    "conv3": ("conv3", "conv"),
    "conv4": ("conv4", "conv"),
    "score_head.0": ("score_head0", "conv"),
    "score_head.2": ("score_head2", "conv"),
    "score_head.4": ("score_head4", "conv"),
    "score_head.6": ("score_head6", "conv"),
    "desc_head.offset_conv.0": ("desc_head/offset_conv1", "conv"),
    "desc_head.offset_conv.2": ("desc_head/offset_conv2", "conv"),
    "desc_head.sf_conv": ("desc_head/sf_conv", "conv"),
    "desc_head.agg_weights": ("desc_head/agg_weights", "raw"),
}


def convert_aliked_state_dict(state_dict, template_params):
    """Map a torch ALIKED checkpoint onto this module's param pytree.

    Returns (params, batch_stats, unmapped_keys). Works on numpy-like
    tensors (call .numpy() upstream if feeding real torch tensors).
    """
    import numpy as np

    params = jax.tree_util.tree_map(np.asarray, template_params["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, template_params.get("batch_stats", {})
    )

    def set_in(tree, path, value, expect_shape=True):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node[p]
        old = node[parts[-1]]
        if expect_shape and tuple(old.shape) != tuple(value.shape):
            raise ValueError(
                f"{path}: shape {value.shape} != template {old.shape}"
            )
        node[parts[-1]] = value.astype(old.dtype)

    used = set()
    for prefix, (dst, kind) in ALIKED_TORCH_MAP.items():
        if kind == "raw":
            if prefix in state_dict:
                set_in(params, dst, np.asarray(state_dict[prefix]))
                used.add(prefix)
            continue
        wkey = f"{prefix}.weight"
        if wkey not in state_dict:
            continue
        wt = np.asarray(state_dict[wkey])
        used.add(wkey)
        if kind == "bn":
            set_in(params, f"{dst}/scale", wt)
            set_in(params, f"{dst}/bias", np.asarray(state_dict[f"{prefix}.bias"]))
            set_in(stats, f"{dst}/mean",
                   np.asarray(state_dict[f"{prefix}.running_mean"]))
            set_in(stats, f"{dst}/var",
                   np.asarray(state_dict[f"{prefix}.running_var"]))
            used.update({f"{prefix}.bias", f"{prefix}.running_mean",
                         f"{prefix}.running_var",
                         f"{prefix}.num_batches_tracked"})
            continue
        # conv weights: torch OIHW -> flax HWIO; sf_conv is 1x1
        hwio = np.transpose(wt, (2, 3, 1, 0))
        if kind == "dcn_weight":
            set_in(params, f"{dst}/weight", hwio)
        elif dst.endswith("sf_conv"):
            # flax Dense kernel [C_in, C_out] from 1x1 conv [O, I, 1, 1]
            set_in(params, f"{dst}/kernel", hwio[0, 0])
        else:
            set_in(params, f"{dst}/kernel", hwio)
        bkey = f"{prefix}.bias"
        if bkey in state_dict:
            set_in(params, f"{dst}/bias", np.asarray(state_dict[bkey]))
            used.add(bkey)
    unmapped = [k for k in state_dict if k not in used]
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out, unmapped
