"""Cached-feature loading + triplet matching pipeline.

Parity targets: gluefactory/models/cache_loader.py (CacheLoader model:
h5py prediction caches re-served as a registry model, with
pad_local_features for static batch shapes) and
gluefactory/models/triplet_pipeline.py (TripletPipeline: one extractor
pass per view, matcher over the three pairs 0to1/0to2/1to2).

TPU angle: padding to a fixed keypoint count is what keeps downstream
matcher graphs static-shape, so the padding layer is first-class here
(the reference needed it only for batch collation).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from .eval_pipeline import load_predictions
from .registry import register_model

__all__ = [
    "pad_to_length",
    "pad_local_features",
    "CacheLoader",
    "TripletPipeline",
]


def pad_to_length(
    x: np.ndarray,
    length: int,
    axis: int = -2,
    mode: str = "zeros",
    bounds=(None, None),
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Pad ``x`` along ``axis`` to ``length`` (models/utils/misc.py:19-57).

    Modes: "zeros", "ones", "random" (uniform over the array's value
    range), "random_c" (per-channel uniform over each channel's range —
    the keypoint-padding mode: fake keypoints inside the real cloud's
    bounding box).
    """
    d = x.shape[axis]
    if d > length:
        raise ValueError(f"cannot pad axis of size {d} down to {length}")
    if d == length:
        return x
    rng = rng or np.random.default_rng(0)
    shape = list(x.shape)
    shape[axis] = length - d
    low, high = bounds
    if mode == "zeros":
        xn = np.zeros(shape, x.dtype)
    elif mode == "ones":
        xn = np.ones(shape, x.dtype)
    elif mode == "random":
        # empty input (e.g. zero detected keypoints): fall back to the
        # caller's bounds, else [0, 1) — never x.min() of an empty array
        lo = low if low is not None else (float(x.min()) if d > 0 else 0.0)
        hi = high if high is not None else (float(x.max()) if d > 0 else 1.0)
        xn = rng.uniform(lo, hi, shape).astype(x.dtype)
    elif mode == "random_c":
        cols = []
        cshape = shape[:-1] + [1]
        for i in range(shape[-1]):
            lo = float(x[..., i].min()) if d > 0 else (low or 0.0)
            hi = float(x[..., i].max()) if d > 0 else (high or 1.0)
            cols.append(rng.uniform(lo, hi, cshape))
        xn = np.concatenate(cols, -1).astype(x.dtype)
    else:
        raise ValueError(mode)
    return np.concatenate([x, xn], axis=axis)


_LOCAL_FEATURE_PAD = {
    "keypoints": (-2, "random_c"),
    "keypoint_scores": (-1, "zeros"),
    "descriptors": (-2, "random"),
    "scales": (-1, "zeros"),
    "oris": (-1, "zeros"),
    "depth_keypoints": (-1, "zeros"),
    "valid_depth_keypoints": (-1, "zeros"),
}


def pad_local_features(pred: Dict[str, np.ndarray], length: int) -> Dict:
    """Pad every known local-feature field to a fixed keypoint count
    (cache_loader.py:13-41)."""
    out = dict(pred)
    for key, (axis, mode) in _LOCAL_FEATURE_PAD.items():
        if key in out:
            out[key] = pad_to_length(np.asarray(out[key]), length, axis, mode)
    return out


class CacheLoader:
    """Serve cached predictions as a model (cache_loader.py:59-141).

    ``path`` may be a format string over fields of the data dict
    (e.g. "exports/{scene}/preds.h5"); the item's "name" selects the
    group. Float arrays are cast to ``numeric_type``; fields starting
    with a ``scale`` pattern are multiplied by the item's "scales".
    """

    def __init__(
        self,
        path: str,
        data_keys: Optional[Sequence[str]] = None,
        scale: Sequence[str] = ("keypoints", "lines", "orig_lines"),
        padding_length: Optional[int] = None,
        padding_fn=pad_local_features,
        numeric_type: str = "float32",
    ):
        self.path = path
        self.data_keys = list(data_keys) if data_keys is not None else None
        self.scale = tuple(scale)
        self.padding_length = padding_length
        self.padding_fn = padding_fn
        self.numeric_dtype = {
            None: None,
            "none": None,
            "float16": np.float16,
            "float32": np.float32,
            "float64": np.float64,
        }[numeric_type]

    def __call__(self, data: Dict) -> Dict[str, np.ndarray]:
        import string

        var_names = [f[1] for f in string.Formatter().parse(self.path) if f[1]]
        fpath = self.path.format(**{k: data[k] for k in var_names})
        pred = load_predictions(fpath, data["name"])
        if self.data_keys is not None:
            pred = {k: pred[k] for k in self.data_keys if k in pred}
        if self.numeric_dtype is not None:
            pred = {
                k: v.astype(self.numeric_dtype)
                if np.issubdtype(v.dtype, np.floating)
                else v
                for k, v in pred.items()
            }
        for k in list(pred):
            for pattern in self.scale:
                if k.startswith(pattern) and "scales" in data:
                    scaled = pred[k] * np.asarray(data["scales"])
                    pred[k] = scaled.astype(pred[k].dtype, copy=False)
        if self.padding_length is not None and self.padding_fn is not None:
            pred = self.padding_fn(pred, self.padding_length)
        return pred


register_model(
    "cache_loader",
    {
        "path": "",
        "data_keys": None,
        "padding_length": None,
        "numeric_type": "float32",
    },
)(CacheLoader)


class TripletPipeline:
    """Extractor once per view, matcher over all three pairs
    (triplet_pipeline.py:23-72). Falls back to two-view behavior when no
    third image is given."""

    PAIRS = (("0to1", 0, 1), ("0to2", 0, 2), ("1to2", 1, 2))

    def __init__(self, extractor, matcher):
        self.extractor = extractor
        self.matcher = matcher

    def __call__(self, image0, image1, image2=None):
        if image2 is None:
            feats0 = self.extractor(image0)
            feats1 = self.extractor(image1)
            return {"feats0": feats0, "feats1": feats1,
                    **self.matcher(feats0, feats1)}
        feats = [self.extractor(im) for im in (image0, image1, image2)]
        out = {f"feats{i}": f for i, f in enumerate(feats)}
        for key, i, j in self.PAIRS:
            out[key] = self.matcher(feats[i], feats[j])
        return out
