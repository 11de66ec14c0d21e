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
