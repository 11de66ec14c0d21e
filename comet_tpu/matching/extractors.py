"""Registered feature extractors for the TwoViewPipeline.

Wraps the JAX SuperPoint (models/superpoint.py) and the SIFT extractor
(matching/sift.py) behind the glue-factory-style registry so pipelines can
be assembled by name (gluefactory/models/two_view_pipeline.py pattern).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.superpoint import SuperPoint
from .registry import register_model


@register_model(
    "extractor_superpoint",
    {"max_keypoints": 512, "detection_threshold": 0.005, "params_path": None,
     "seed": 0},
)
def make_superpoint(
    max_keypoints: int = 512,
    detection_threshold: float = 0.005,
    params_path: Optional[str] = None,
    seed: int = 0,
):
    """SuperPoint extractor factory. Without ``params_path`` (no network in
    this environment) the detector runs with random init — fine for shape /
    pipeline tests, use converted MagicLeap weights for real matching."""
    model = SuperPoint(
        max_keypoints=max_keypoints, detection_threshold=detection_threshold
    )
    state = {}

    def extract(image: jax.Array) -> Dict[str, jax.Array]:
        gray = image.mean(axis=-1) if image.ndim == 3 else image
        h, w = gray.shape
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
        gray = jnp.pad(gray, ((0, hp - h), (0, wp - w)))
        key = (hp, wp)
        if key not in state:
            params = model.init(jax.random.PRNGKey(seed), gray)
            if params_path:
                from ..utils import load_params_msgpack

                params = load_params_msgpack(params_path, params)
            state[key] = params
        out = model.apply(state[key], gray)
        return {
            "keypoints": out.keypoints,
            "scores": out.scores,
            "descriptors": out.descriptors,
            "valid": (out.scores > 0)
            & (out.keypoints[:, 0] < w)
            & (out.keypoints[:, 1] < h),
        }

    return extract


@register_model(
    "extractor_aliked",
    {"model_name": "aliked-n16", "max_keypoints": 512,
     "detection_threshold": 0.2, "params_path": None, "seed": 0},
)
def make_aliked(
    model_name: str = "aliked-n16",
    max_keypoints: int = 512,
    detection_threshold: float = 0.2,
    params_path: Optional[str] = None,
    seed: int = 0,
):
    """ALIKED extractor factory (gluefactory/models/extractors/aliked.py
    parity; see models/aliked.py for the TPU redesign). Weightless-capable
    like the SuperPoint factory; real checkpoints go through
    models.aliked.convert_aliked_state_dict."""
    from ..models.aliked import ALIKED

    model = ALIKED(
        model_name=model_name, max_keypoints=max_keypoints,
        detection_threshold=detection_threshold,
    )
    state = {}

    def extract(image: jax.Array) -> Dict[str, jax.Array]:
        img = image if image.ndim == 3 else jnp.repeat(image[..., None], 3, -1)
        h, w = img.shape[:2]
        hp, wp = -(-h // 32) * 32, -(-w // 32) * 32
        img = jnp.pad(img, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
        key = (hp, wp)
        if key not in state:
            variables = model.init(jax.random.PRNGKey(seed), img[None])
            if params_path:
                from ..utils import load_params_msgpack

                variables = load_params_msgpack(params_path, variables)
            state[key] = variables
        out = model.apply(state[key], img[None])
        return {
            "keypoints": out.keypoints[0],
            "scores": out.scores[0],
            "descriptors": out.descriptors[0],
            "valid": out.valid[0]
            & (out.keypoints[0, :, 0] < w)
            & (out.keypoints[0, :, 1] < h),
        }

    return extract


@register_model(
    "extractor_disk",
    {"max_keypoints": 512, "detection_threshold": 0.0, "nms_window_size": 5,
     "params_path": None, "seed": 0},
)
def make_disk(
    max_keypoints: int = 512,
    detection_threshold: float = 0.0,
    nms_window_size: int = 5,
    params_path: Optional[str] = None,
    seed: int = 0,
):
    """DISK extractor factory (disk_kornia.py parity; see models/disk.py).
    Pads to a multiple of 16 like the reference (pad_if_not_divisible) and
    invalidates keypoints that land in the padding."""
    from ..models.disk import DISK

    model = DISK(
        max_keypoints=max_keypoints, nms_window_size=nms_window_size,
        detection_threshold=detection_threshold,
    )
    state = {}

    def extract(image: jax.Array) -> Dict[str, jax.Array]:
        img = image if image.ndim == 3 else jnp.repeat(image[..., None], 3, -1)
        h, w = img.shape[:2]
        hp, wp = -(-h // 16) * 16, -(-w // 16) * 16
        img = jnp.pad(img, ((0, hp - h), (0, wp - w), (0, 0)))
        key = (hp, wp)
        if key not in state:
            variables = model.init(jax.random.PRNGKey(seed), img[None])
            if params_path:
                from ..utils import load_params_msgpack

                variables = load_params_msgpack(params_path, variables)
            state[key] = variables
        out = model.apply(state[key], img[None])
        return {
            "keypoints": out.keypoints[0],
            "scores": out.scores[0],
            "descriptors": out.descriptors[0],
            "valid": out.valid[0]
            & (out.keypoints[0, :, 0] < w)
            & (out.keypoints[0, :, 1] < h),
        }

    return extract


@register_model(
    "extractor_keynet",
    {"max_keypoints": 512, "num_levels": 3, "params_path": None, "seed": 0},
)
def make_keynet(
    max_keypoints: int = 512,
    num_levels: int = 3,
    params_path: Optional[str] = None,
    seed: int = 0,
):
    """KeyNet+HardNet extractor factory (keynet_affnet_hardnet.py parity;
    see models/keynet.py — AffNet reduced to upright patches)."""
    from ..models.keynet import KeyNetHardNet

    model = KeyNetHardNet(max_keypoints=max_keypoints, num_levels=num_levels)
    state = {}

    def extract(image: jax.Array) -> Dict[str, jax.Array]:
        img = image if image.ndim == 3 else image[..., None]
        key = img.shape[:2]
        if key not in state:
            variables = model.init(jax.random.PRNGKey(seed), img)
            if params_path:
                from ..utils import load_params_msgpack

                variables = load_params_msgpack(params_path, variables)
            state[key] = variables
        out = model.apply(state[key], img)
        return {
            "keypoints": out.keypoints,
            "scores": out.scores,
            "descriptors": out.descriptors,
            "valid": out.valid,
            "scales": out.scales,
            "oris": out.oris,
        }

    return extract


@register_model("extractor_grid", {"cell_size": 14})
def make_grid_extractor(cell_size: int = 14):
    """Dense grid "detector" (grid_extractor.py:21-56 parity): one
    keypoint at the center of every cell_size x cell_size cell, at
    ``idx * cell + cell/2 + 0.5`` (the reference adds +0.5 on top of the
    cell center). No descriptors — pair with ``extractor_mixed`` to
    interpolate them from a dense map."""

    def extract(image: jax.Array) -> Dict[str, jax.Array]:
        h, w = image.shape[:2]
        gh, gw = h // cell_size, w // cell_size
        ys = jnp.arange(gh, dtype=jnp.float32) * cell_size + cell_size / 2
        xs = jnp.arange(gw, dtype=jnp.float32) * cell_size + cell_size / 2
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        kpts = jnp.stack([gx, gy], -1).reshape(-1, 2) + 0.5
        n = kpts.shape[0]
        return {
            "keypoints": kpts,
            "scores": jnp.ones((n,), jnp.float32),
            "valid": jnp.ones((n,), bool),
            "grid_shape": (gh, gw),
        }

    return extract


@register_model(
    "dense_disk", {"desc_dim": 128, "params_path": None, "seed": 0}
)
def make_dense_disk(
    desc_dim: int = 128,
    params_path: Optional[str] = None,
    seed: int = 0,
):
    """Dense DISK descriptor map (the U-Net's descriptor head without
    keypoint selection): image [H, W, (3)] -> [H, W, desc_dim]. The
    ``interpolate_descriptors_from`` source of the reference's mixed
    extractor (mixed.py:41-55)."""
    from ..models.disk import DISKUnet

    model = DISKUnet(up=(64, 64, 64, desc_dim + 1))
    state = {}

    def dense(image: jax.Array) -> jax.Array:
        img = image if image.ndim == 3 else jnp.repeat(image[..., None], 3, -1)
        h, w = img.shape[:2]
        hp, wp = -(-h // 16) * 16, -(-w // 16) * 16
        img = jnp.pad(img, ((0, hp - h), (0, wp - w), (0, 0)))
        key = (hp, wp)
        if key not in state:
            variables = model.init(jax.random.PRNGKey(seed), img[None])
            if params_path:
                from ..utils import load_params_msgpack

                variables = load_params_msgpack(params_path, variables)
            state[key] = variables
        out = model.apply(state[key], img[None])[0]
        return out[:h, :w, :desc_dim]

    return dense


@register_model(
    "extractor_mixed",
    {
        "detector": "extractor_grid",
        "detector_conf": {},
        "descriptor": "dense_disk",
        "descriptor_conf": {},
    },
)
def make_mixed_extractor(
    detector: str = "extractor_grid",
    detector_conf: Optional[Dict] = None,
    descriptor: str = "dense_disk",
    descriptor_conf: Optional[Dict] = None,
):
    """Mixed detector+descriptor extractor (mixed.py:10-57 parity): run a
    registered detector for keypoints, a registered dense-descriptor model
    for a feature map, and bilinearly interpolate per-keypoint descriptors
    at the keypoint locations.

    Sampling matches the reference's ``F.grid_sample(align_corners=False)``
    on ``kpts / [w, h] * 2 - 1`` (mixed.py:44-55), which in pixel space is
    a sample at ``kpts - 0.5``; descriptors are L2-normalized like every
    extractor in the stack."""
    from .registry import get_model as _get
    from ..ops.bilinear import bilinear_sample

    det = _get(detector, **(detector_conf or {}))
    dense = _get(descriptor, **(descriptor_conf or {}))

    def extract(image: jax.Array) -> Dict[str, jax.Array]:
        pred = dict(det(image))
        fmap = dense(image)  # [H, W, D]
        pts = pred["keypoints"] - 0.5
        desc = bilinear_sample(fmap, pts, padding_mode="zeros")
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
        )
        pred["descriptors"] = desc
        return pred

    return extract
