"""Named experiment configurations for the matching stack.

Parity target: gluefactory/configs/*.yaml (23 experiment YAMLs pairing an
extractor with a matcher plus GT-generation and training settings, e.g.
superpoint+lightglue_homography.yaml, aliked+NN.yaml,
superpoint+lsd+gluestick.yaml). Here each experiment is a typed nested
dict consumed by ``build_pipeline``; the registry (matching/registry.py)
plays the role of gluefactory's get_model name resolution, and the
homography GT / trainer settings mirror the YAML structure without an
OmegaConf dependency.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

from .registry import TwoViewPipeline, get_model

# Every experiment: {extractor: {name, ...conf}, matcher: {name, ...conf},
# ground_truth: {...}, train: {...}}. The `train` block feeds
# matching/train.py's homography trainer; inference-only use reads just the
# extractor/matcher blocks.
_BASE_TRAIN = {
    "seed": 0,
    "epochs": 40,
    "lr": 1e-4,
    "batch_size": 32,
    "homography": {"difficulty": 0.7, "max_angle": 45.0},
}

EXPERIMENTS: Dict[str, Dict[str, Any]] = {
    # -- point extractors + NN (evaluation baselines, *+NN.yaml) --
    "superpoint+nn": {
        "extractor": {"name": "extractor_superpoint", "max_keypoints": 512},
        "matcher": {"name": "matcher_nn", "threshold": 0.0},
        "ground_truth": {"th_positive": 3.0, "th_negative": 3.0},
        "train": None,  # eval-only pairing
    },
    "sift+nn": {
        "extractor": {"name": "extractor_sift", "max_keypoints": 512},
        "matcher": {"name": "matcher_nn", "threshold": 0.0},
        "ground_truth": {"th_positive": 3.0, "th_negative": 3.0},
        "train": None,
    },
    "aliked+nn": {
        "extractor": {"name": "extractor_aliked", "max_keypoints": 512},
        "matcher": {"name": "matcher_nn", "threshold": 0.0},
        "ground_truth": {"th_positive": 3.0, "th_negative": 3.0},
        "train": None,
    },
    "disk+nn": {
        "extractor": {"name": "extractor_disk", "max_keypoints": 512},
        "matcher": {"name": "matcher_nn", "threshold": 0.0},
        "ground_truth": {"th_positive": 3.0, "th_negative": 3.0},
        "train": None,
    },
    "keynet+nn": {
        "extractor": {"name": "extractor_keynet", "max_keypoints": 512},
        "matcher": {"name": "matcher_nn", "threshold": 0.0},
        "ground_truth": {"th_positive": 3.0, "th_negative": 3.0},
        "train": None,
    },
    # -- trainable matchers on homography GT (*_homography.yaml) --
    "superpoint+lightglue_homography": {
        "extractor": {"name": "extractor_superpoint", "max_keypoints": 512},
        "matcher": {
            "name": "matcher_lightglue", "depth": 9, "dim": 256,
            "filter_threshold": 0.1,
        },
        "ground_truth": {"th_positive": 3.0, "th_negative": 5.0},
        "train": dict(_BASE_TRAIN),
    },
    "sift+lightglue_homography": {
        "extractor": {"name": "extractor_sift", "max_keypoints": 512},
        "matcher": {
            "name": "matcher_lightglue", "depth": 9, "dim": 256,
            "filter_threshold": 0.1,
        },
        "ground_truth": {"th_positive": 3.0, "th_negative": 5.0},
        "train": dict(_BASE_TRAIN),
    },
    "aliked+lightglue_homography": {
        "extractor": {"name": "extractor_aliked", "max_keypoints": 512},
        "matcher": {
            "name": "matcher_lightglue", "depth": 9, "dim": 256,
            "filter_threshold": 0.1,
        },
        "ground_truth": {"th_positive": 3.0, "th_negative": 5.0},
        "train": dict(_BASE_TRAIN),
    },
    "superpoint+superglue": {
        "extractor": {"name": "extractor_superpoint", "max_keypoints": 512},
        "matcher": {
            "name": "matcher_superglue", "depth": 9, "dim": 256,
            "sinkhorn_iters": 50, "filter_threshold": 0.2,
        },
        "ground_truth": {"th_positive": 3.0, "th_negative": 5.0},
        "train": dict(_BASE_TRAIN),
    },
    # -- line + point wireframes (superpoint+lsd+gluestick.yaml) --
    "superpoint+lsd+gluestick": {
        "extractor": {
            "name": "extractor_wireframe",
            "point_extractor": "extractor_superpoint",
            "max_lines": 64,
        },
        "matcher": {"name": "matcher_gluestick", "depth": 6, "dim": 128},
        "ground_truth": {"th_positive": 3.0, "th_negative": 5.0},
        "train": dict(_BASE_TRAIN),
    },
    "deeplsd+gluestick": {
        "extractor": {
            "name": "extractor_wireframe",
            "point_extractor": "extractor_superpoint",
            "line_detector": "lines_deeplsd",
            "max_lines": 64,
        },
        "matcher": {"name": "matcher_gluestick", "depth": 6, "dim": 128},
        "ground_truth": {"th_positive": 3.0, "th_negative": 5.0},
        "train": dict(_BASE_TRAIN),
    },
}


def list_experiments():
    return sorted(EXPERIMENTS)


def get_experiment(name: str) -> Dict[str, Any]:
    """Deep copy of a named experiment config (safe to mutate)."""
    if name not in EXPERIMENTS:
        raise KeyError(
            f"unknown experiment '{name}'; have {list_experiments()}"
        )
    return copy.deepcopy(EXPERIMENTS[name])


def wrap_flax_matcher(matcher, image_hw, seed: int = 0):
    """Adapt a flax matcher module to the TwoViewPipeline callable contract
    ``(feats0, feats1) -> matches``: pixel keypoints normalize to [-1, 1]
    by the image size, validity masks pass through, and params initialize
    lazily (random weights — assign ``wrapper.holder["params"]`` to use
    trained ones)."""
    import jax
    import jax.numpy as jnp

    h, w = image_hw
    scale = jnp.asarray([max(w - 1.0, 1.0), max(h - 1.0, 1.0)], jnp.float32)
    holder = {"params": None}

    def norm(k):
        return k.astype(jnp.float32) / scale * 2.0 - 1.0

    import inspect

    takes_lines = "lines0" in inspect.signature(matcher.__call__).parameters

    def call(f0, f1):
        a = [
            norm(f0["keypoints"]), f0["descriptors"],
            norm(f1["keypoints"]), f1["descriptors"],
        ]
        kw = {"valid0": f0.get("valid"), "valid1": f1.get("valid")}
        if takes_lines:  # GlueStick: joint point+line token set
            a += [
                norm(f0["lines"]), f0["line_descriptors"],
                norm(f1["lines"]), f1["line_descriptors"],
            ]
            kw["lvalid0"] = f0.get("line_valid")
            kw["lvalid1"] = f1.get("line_valid")
        if holder["params"] is None:
            holder["params"] = matcher.init(jax.random.PRNGKey(seed), *a, **kw)
        return matcher.apply(holder["params"], *a, **kw)

    call.holder = holder
    return call


def build_pipeline(name: str, image_hw=None, **overrides) -> TwoViewPipeline:
    """Instantiate the extractor+matcher pair of a named experiment.

    ``overrides`` are applied onto the top-level blocks, e.g.
    ``build_pipeline("superpoint+nn", matcher={"threshold": 0.2})``.
    Flax matcher modules (LightGlue/SuperGlue/GlueStick) are wrapped into
    pipeline callables when ``image_hw`` is given; otherwise they are
    returned raw for callers that manage init/apply themselves.
    """
    conf = get_experiment(name)
    for k, v in overrides.items():
        if isinstance(v, dict) and isinstance(conf.get(k), dict):
            conf[k].update(v)
        else:
            conf[k] = v
    ext_conf = dict(conf["extractor"])
    extractor = get_model(ext_conf.pop("name"), **ext_conf)
    mat_conf = dict(conf["matcher"])
    matcher = get_model(mat_conf.pop("name"), **mat_conf)
    if image_hw is not None and hasattr(matcher, "init"):
        matcher = wrap_flax_matcher(matcher, image_hw)
    return TwoViewPipeline(extractor, matcher)
