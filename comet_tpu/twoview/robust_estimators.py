"""Robust-estimator plugin layer (the glue-factory pattern).

Parity target: gluefactory/robust_estimators/base_estimator.py:1-40 +
load_estimator (robust_estimators/__init__.py) and the per-backend plugin
modules (homography/{opencv,poselib,homography_est}.py,
relative_pose/{opencv,poselib,pycolmap}.py). The reference dispatches to
external native solvers (OpenCV/poselib/pycolmap); here every backend is
one of the repo's own batched-XLA RANSAC implementations
(twoview/estimators.py, twoview/solvers.py) — the TPU equivalent of a
"native" solver — selected by name through one config-merged interface.

API shape kept: ``get_estimator(type, name)(conf)({"m_kpts0": ...})`` ->
``{"success", "M_0to1", "inliers"}``; relative-pose backends return
``(R, t)`` as ``M_0to1`` like the reference's ``Pose.from_Rt``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


class BaseEstimator:
    """Config-merged estimator (base_estimator.py:6-33 without OmegaConf:
    plain dict merge, read via attribute-style lookup on `self.conf`)."""

    base_default_conf: Dict[str, Any] = {"ransac_th": 3.0, "seed": 0,
                                         "num_hypotheses": 128}
    default_conf: Dict[str, Any] = {}
    required_data_keys: Tuple[str, ...] = ()

    def __init__(self, conf: Dict[str, Any] = None):
        merged = {**self.base_default_conf, **self.default_conf, **(conf or {})}
        unknown = set(merged) - set(self.base_default_conf) - set(self.default_conf)
        if unknown:
            raise KeyError(f"unknown conf keys {sorted(unknown)} for "
                           f"{type(self).__name__}")
        self.conf = merged

    def __call__(self, data: Dict[str, Any]) -> Dict[str, Any]:
        missing = [k for k in self.required_data_keys if k not in data]
        if missing:
            raise KeyError(f"{type(self).__name__} requires {missing}")
        return self._forward(data)

    def _key(self):
        return jax.random.PRNGKey(self.conf["seed"])


_ESTIMATORS: Dict[Tuple[str, str], type] = {}


def register_estimator(kind: str, name: str) -> Callable[[type], type]:
    def deco(cls):
        _ESTIMATORS[(kind, name)] = cls
        return cls

    return deco


def load_estimator(kind: str, name: str) -> type:
    """Reference ``load_estimator(type, estimator)`` equivalent."""
    try:
        return _ESTIMATORS[(kind, name)]
    except KeyError:
        have = sorted(n for k, n in _ESTIMATORS if k == kind)
        raise KeyError(f"no {kind} estimator '{name}'; have {have}")


def get_estimator(kind: str, name: str, conf: Dict[str, Any] = None):
    return load_estimator(kind, name)(conf)


def list_estimators(kind: str = None):
    return sorted(
        (k, n) for k, n in _ESTIMATORS if kind is None or k == kind
    )


@register_estimator("homography", "ransac")
class RansacHomographyEstimator(BaseEstimator):
    """Batched-hypothesis DLT RANSAC + inlier refit
    (OpenCVHomographyEstimator surface, homography/opencv.py:8-53)."""

    default_conf = {"ransac_th": 3.0}
    required_data_keys = ("m_kpts0", "m_kpts1")

    def _forward(self, data):
        from .estimators import estimate_homography_ransac

        res = estimate_homography_ransac(
            jnp.asarray(data["m_kpts0"]), jnp.asarray(data["m_kpts1"]),
            key=self._key(),
            # transfer error is SQUARED px — square the pixel threshold
            threshold=float(self.conf["ransac_th"]) ** 2,
            num_hypotheses=self.conf["num_hypotheses"],
        )
        return {
            "success": bool(res.score >= 4),
            "M_0to1": res.model,
            "inliers": res.inliers,
        }


@register_estimator("homography", "dlt")
class DltHomographyEstimator(BaseEstimator):
    """Plain (optionally weighted) normalized DLT — the minimal backend,
    for pre-filtered correspondences."""

    default_conf = {"ransac_th": 3.0}
    required_data_keys = ("m_kpts0", "m_kpts1")

    def _forward(self, data):
        from .estimators import homography_transfer_error, run_homography_dlt

        p0 = jnp.asarray(data["m_kpts0"])
        p1 = jnp.asarray(data["m_kpts1"])
        h = run_homography_dlt(p0, p1, weights=data.get("weights"))
        inl = (
            homography_transfer_error(h, p0, p1)
            < float(self.conf["ransac_th"]) ** 2  # squared px error
        )
        return {"success": bool(inl.sum() >= 4), "M_0to1": h, "inliers": inl}


def _relpose_from_essential(res, r, t, n_pts):
    ok = bool(res.score >= 5)
    return {
        "success": ok,
        "M_0to1": (r, t),
        "inliers": res.inliers if ok else jnp.zeros((n_pts,), bool),
        "E": res.model,
    }


@register_estimator("relative_pose", "ransac")
class RansacRelativePoseEstimator(BaseEstimator):
    """Essential-matrix RANSAC (normalized 8-point) + cheirality motion
    recovery (OpenCVRelativePoseEstimator surface,
    relative_pose/opencv.py:10-66). ``ransac_th`` is in PIXELS and is
    normalized by the mean focal like the reference (:31-32)."""

    default_conf = {"ransac_th": 0.5}
    required_data_keys = ("m_kpts0", "m_kpts1", "K0", "K1")

    def _forward(self, data):
        from .estimators import estimate_essential_ransac

        k0 = jnp.asarray(data["K0"], jnp.float32)
        k1 = jnp.asarray(data["K1"], jnp.float32)
        f_mean = (k0[0, 0] + k0[1, 1] + k1[0, 0] + k1[1, 1]) / 4.0
        # sampson_distance is SQUARED (two_view_geo/utils.py:90 parity) —
        # the pixel threshold normalizes by the focal, then squares
        res, r, t = estimate_essential_ransac(
            jnp.asarray(data["m_kpts0"]), jnp.asarray(data["m_kpts1"]),
            k0, k1, key=self._key(),
            threshold=float(self.conf["ransac_th"] / f_mean) ** 2,
            num_hypotheses=self.conf["num_hypotheses"],
        )
        return _relpose_from_essential(res, r, t, data["m_kpts0"].shape[0])


@register_estimator("relative_pose", "nister")
class NisterRelativePoseEstimator(BaseEstimator):
    """Minimal-sample Nistér 5-point RANSAC (the poselib-backend
    capability, relative_pose/poselib.py) via the in-repo
    evaluation-interpolation solver (twoview/solvers.py:122)."""

    default_conf = {"ransac_th": 0.5, "num_hypotheses": 64}
    required_data_keys = ("m_kpts0", "m_kpts1", "K0", "K1")

    def _forward(self, data):
        from .solvers import estimate_essential_5point_ransac

        k0 = jnp.asarray(data["K0"], jnp.float32)
        k1 = jnp.asarray(data["K1"], jnp.float32)
        f_mean = (k0[0, 0] + k0[1, 1] + k1[0, 0] + k1[1, 1]) / 4.0
        res, r, t = estimate_essential_5point_ransac(
            jnp.asarray(data["m_kpts0"]), jnp.asarray(data["m_kpts1"]),
            k0, k1, key=self._key(),
            threshold=float(self.conf["ransac_th"] / f_mean) ** 2,
            num_hypotheses=self.conf["num_hypotheses"],
        )
        return _relpose_from_essential(res, r, t, data["m_kpts0"].shape[0])


@register_estimator("fundamental", "ransac")
class RansacFundamentalEstimator(BaseEstimator):
    """8-point Sampson RANSAC with inlier refit
    (two_view_geo/fundamental.py:43 capability)."""

    default_conf = {"ransac_th": 1.0}
    required_data_keys = ("m_kpts0", "m_kpts1")

    def _forward(self, data):
        from .estimators import estimate_fundamental_ransac

        res = estimate_fundamental_ransac(
            jnp.asarray(data["m_kpts0"]), jnp.asarray(data["m_kpts1"]),
            key=self._key(),
            threshold=float(self.conf["ransac_th"]) ** 2,  # squared sampson
            num_hypotheses=self.conf["num_hypotheses"],
        )
        return {
            "success": bool(res.score >= 8),
            "M_0to1": res.model,
            "inliers": res.inliers,
        }
