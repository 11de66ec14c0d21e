"""Matching evaluation metrics.

Parity target: the vendored glue-factory test/eval utilities
(comet/models/dependency/glue-factory/tests/test_eval_utils.py:9-89 /
gluefactory/eval/eval_pipeline.py): given predicted matches and the true
homography, report match count, reprojection precision at a pixel
threshold, and recall against the GT assignment.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .gt_generation import gt_matches_from_homography, warp_homography


def eval_matches_homography(
    kpts0,  # [N0, 2]
    kpts1,  # [N1, 2]
    matches0,  # [N0] predicted (index into kpts1 or -1)
    h,  # [3, 3] true homography image0 -> image1
    threshold: float = 3.0,
) -> Dict[str, jnp.ndarray]:
    """Returns num_matches, prec@threshold, and recall vs the GT labels."""
    matched = matches0 >= 0
    idx = jnp.clip(matches0, 0, kpts1.shape[0] - 1)
    proj0 = warp_homography(kpts0, h)
    err = jnp.linalg.norm(proj0 - kpts1[idx], axis=-1)
    correct = matched & (err < threshold)
    num = matched.sum()
    prec = jnp.where(num > 0, correct.sum() / jnp.maximum(num, 1), 0.0)

    gt = gt_matches_from_homography(
        kpts0, kpts1, h, pos_threshold=threshold
    )["matches0"]
    gt_pos = gt >= 0
    hit = gt_pos & (matches0 == gt)
    recall = jnp.where(
        gt_pos.sum() > 0, hit.sum() / jnp.maximum(gt_pos.sum(), 1), 0.0
    )
    return {
        "num_matches": num,
        f"prec@{threshold:g}px": prec,
        "recall": recall,
    }
