"""Homography matching benchmark pipeline (the HPatches-style eval loop).

Parity target: gluefactory/eval/hpatches.py + eval/eval_pipeline.py — run a
TwoViewPipeline over image pairs with ground-truth homographies and report
aggregate match metrics (num_matches, precision@px, recall) plus the
RANSAC-estimated homography's corner error (the reference's
``H_error_ransac``). The dataset here is synthetic (images warped by known
homographies) since no benchmark archives can be downloaded in this
environment; the loop, metrics and estimator plumbing match the reference
pipeline so a real HPatches directory only needs a loader.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bilinear import bilinear_sample
from .eval import eval_matches_homography
from .gt_generation import warp_homography


def random_homography(
    rng: np.random.Generator,
    h: int,
    w: int,
    max_rotation: float = 0.15,
    max_scale: float = 0.15,
    max_translation: float = 0.08,
    max_perspective: float = 2e-4,
) -> np.ndarray:
    """Random in-place homography (rotation/scale/translation/perspective
    about the image center), gluefactory homography-adapter style."""
    ang = rng.uniform(-max_rotation, max_rotation)
    sc = 1.0 + rng.uniform(-max_scale, max_scale)
    tx = rng.uniform(-max_translation, max_translation) * w
    ty = rng.uniform(-max_translation, max_translation) * h
    ca, sa = np.cos(ang), np.sin(ang)
    center = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1.0]])
    rot = np.array([[sc * ca, -sc * sa, tx], [sc * sa, sc * ca, ty], [0, 0, 1.0]])
    persp = np.eye(3)
    persp[2, 0] = rng.uniform(-max_perspective, max_perspective)
    persp[2, 1] = rng.uniform(-max_perspective, max_perspective)
    return np.linalg.inv(center) @ persp @ rot @ center


def warp_image(image: jax.Array, h_mat: jax.Array) -> jax.Array:
    """Warp [H, W, C] by the homography (image1[p] = image0[H^-1 p])."""
    hh, ww = image.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(hh), jnp.arange(ww), indexing="ij")
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(
        jnp.float32
    )
    src = warp_homography(grid, jnp.linalg.inv(h_mat))
    return bilinear_sample(image, src, padding_mode="zeros").reshape(
        hh, ww, image.shape[-1]
    )


def homography_corner_error(
    h_est: jax.Array, h_gt: jax.Array, hw: Tuple[int, int]
) -> jax.Array:
    """Mean reprojection distance of the four image corners — the
    ``H_error_ransac`` metric (gluefactory eval/utils)."""
    h, w = hw
    corners = jnp.asarray(
        [[0.0, 0.0], [w - 1, 0.0], [w - 1, h - 1], [0.0, h - 1]], jnp.float32
    )
    return jnp.linalg.norm(
        warp_homography(corners, h_est) - warp_homography(corners, h_gt),
        axis=-1,
    ).mean()


def run_homography_benchmark(
    pipeline,
    pairs: Sequence[Tuple[jax.Array, jax.Array, jax.Array]],
    threshold: float = 3.0,
    ransac_iters: int = 256,
    ransac_threshold: float = 3.0,
    seed: int = 0,
    estimator: str = "ransac",
) -> Dict[str, float]:
    """Evaluate a TwoViewPipeline on (image0, image1, H_gt) pairs.

    Returns mean num_matches, prec@px, recall, H_error_ransac and the
    H_error@{1,3,5}px accuracy buckets over the pairs. ``estimator``
    selects the homography backend through the robust-estimator plugin
    layer (twoview/robust_estimators.py: "ransac" or "dlt"), mirroring the
    reference's ``conf.eval.estimator`` knob.
    """
    from ..twoview.robust_estimators import get_estimator

    est = get_estimator(
        "homography", estimator,
        {"ransac_th": ransac_threshold, "seed": seed,
         "num_hypotheses": ransac_iters},
    )
    per_pair: List[Dict[str, float]] = []
    for image0, image1, h_gt in pairs:
        out = pipeline(image0, image1)
        k0 = out["feats0"]["keypoints"]
        k1 = out["feats1"]["keypoints"]
        m0 = out["matches0"]
        row = {
            k: float(v)
            for k, v in eval_matches_homography(
                k0, k1, m0, h_gt, threshold
            ).items()
        }
        valid = np.asarray(m0) >= 0
        pts0 = np.asarray(k0)[valid]
        pts1 = np.asarray(k1)[np.clip(np.asarray(m0)[valid], 0, k1.shape[0] - 1)]
        if pts0.shape[0] >= 4:
            res = est({
                "m_kpts0": jnp.asarray(pts0, jnp.float32),
                "m_kpts1": jnp.asarray(pts1, jnp.float32),
            })
            row["H_error_ransac"] = (
                float(
                    homography_corner_error(
                        res["M_0to1"], h_gt, image0.shape[:2]
                    )
                )
                if res["success"]
                else float("inf")
            )
        else:
            row["H_error_ransac"] = float("inf")
        per_pair.append(row)

    agg: Dict[str, float] = {}
    for k in per_pair[0]:
        agg[k] = float(np.mean([r[k] for r in per_pair]))
    errs = np.asarray([r["H_error_ransac"] for r in per_pair])
    for t in (1.0, 3.0, 5.0):
        agg[f"H_acc@{t:g}px"] = float((errs < t).mean())
    return agg


def synthetic_texture(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Smooth random texture with corners: low-freq noise + blobs —
    detectable structure for keypoint extractors."""
    base = rng.normal(size=(h // 8, w // 8, 1)).astype(np.float32)
    img = np.asarray(jax.image.resize(jnp.asarray(base), (h, w, 1), "cubic"))
    img = (img - img.min()) / max(float(np.ptp(img)), 1e-6)
    for _ in range(24):
        cy, cx = rng.integers(8, h - 8), rng.integers(8, w - 8)
        img[cy - 3 : cy + 3, cx - 3 : cx + 3] = rng.random()
    return img


def make_synthetic_pairs(
    n_pairs: int,
    hw: Tuple[int, int] = (120, 160),
    seed: int = 0,
    image: Optional[np.ndarray] = None,
) -> List[Tuple[jax.Array, jax.Array, jax.Array]]:
    """Textured random images + random homography warps (the in-env stand-in
    for the HPatches archive)."""
    rng = np.random.default_rng(seed)
    h, w = hw
    pairs = []
    for _ in range(n_pairs):
        if image is None:
            img = synthetic_texture(rng, h, w)
        else:
            img = np.asarray(image, np.float32)
            if img.ndim == 2:
                img = img[..., None]
        h_gt = random_homography(rng, h, w)
        img0 = jnp.asarray(img, jnp.float32)
        img1 = warp_image(img0, jnp.asarray(h_gt, jnp.float32))
        pairs.append((img0, img1, jnp.asarray(h_gt, jnp.float32)))
    return pairs
