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
import numpy as np

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


def matcher_metrics(
    matches0,  # [B, N] predicted (index into kpts1, -1 unmatched)
    gt_matches0,  # [B, N] GT labels (index, -1 unmatched, -2 ignore)
    matching_scores0,  # [B, N] predicted confidence
    prefix: str = "",
) -> Dict[str, jnp.ndarray]:
    """Per-pair matcher training metrics — recall, precision, accuracy,
    ranking AP (gluefactory/models/utils/metrics.py:5-50, exact
    semantics incl. its collapsed AP = last-precision x recall-span)."""
    m, gt, scores = matches0, gt_matches0, matching_scores0
    eps = 1e-8
    correct = (m == gt)

    r_mask = (gt > -1).astype(jnp.float32)
    recall = (correct * r_mask).sum(1) / (eps + r_mask.sum(1))

    a_mask = (gt >= -1).astype(jnp.float32)
    accuracy = (correct * a_mask).sum(1) / (eps + a_mask.sum(1))

    p_mask = ((m > -1) & (gt >= -1)).astype(jnp.float32)
    precision = (correct * p_mask).sum(1) / (eps + p_mask.sum(1))

    order = jnp.argsort(-scores, axis=-1)
    sp = jnp.take_along_axis(p_mask, order, -1)
    sr = jnp.take_along_axis(r_mask, order, -1)
    st = jnp.take_along_axis(correct, order, -1)
    p_pts = jnp.cumsum(st * sp, -1) / (eps + jnp.cumsum(sp, -1))
    r_pts = jnp.cumsum(st * sr, -1) / (eps + sr.sum(-1, keepdims=True))
    ap = jnp.sum((r_pts[:, 1:] - r_pts[:, :-1]) * p_pts[:, -1:], -1)

    return {
        f"{prefix}match_recall": recall,
        f"{prefix}match_precision": precision,
        f"{prefix}accuracy": accuracy,
        f"{prefix}average_precision": ap,
    }


IGNORE_FEATURE = -2


def get_tp_fp_pts(pred_matches, gt_matches, pred_scores):
    """Per-pair TP/FP flags + scores for dataset-level PR aggregation
    (gluefactory/eval/utils.py:227-244): entries whose GT label is
    IGNORE_FEATURE (-2) are excluded; a predicted match is TP iff it
    equals the GT assignment; num_pos counts GT positives."""
    pred_matches = np.asarray(pred_matches)
    gt_matches = np.asarray(gt_matches)
    pred_scores = np.asarray(pred_scores)
    keep = gt_matches != IGNORE_FEATURE
    pred_matches, gt_matches, pred_scores = (
        pred_matches[keep], gt_matches[keep], pred_scores[keep]
    )
    num_pos = int(np.sum(gt_matches != -1))
    pos = pred_matches != -1
    tp = pred_matches[pos] == gt_matches[pos]
    fp = pred_matches[pos] != gt_matches[pos]
    return tp, fp, pred_scores[pos], num_pos


def average_precision(recall_curve, fp_curve):
    """Interpolated VOC-style AP over cumulative recall/FP curves
    (gluefactory/eval/utils.py:247-256 — note its 'tp' argument is
    already the cumulative recall)."""
    recall = np.concatenate(([0.0], recall_curve, [1.0]))
    precision = recall_curve / np.maximum(recall_curve + fp_curve, 1e-9)
    precision = np.concatenate(([0.0], precision, [0.0]))
    for i in range(precision.size - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    i = np.where(recall[1:] != recall[:-1])[0]
    return float(np.sum((recall[i + 1] - recall[i]) * precision[i + 1]))


def aggregate_pr_results(results, suffix=""):
    """Dataset-level PR curves + AP from accumulated per-pair TP/FP lists
    (gluefactory/eval/utils.py:259-272): rank all matches by score,
    cumulate TP/FP over the ranking, normalize by total GT positives."""
    tp_list = np.concatenate(results["tp" + suffix], axis=0)
    fp_list = np.concatenate(results["fp" + suffix], axis=0)
    scores = np.concatenate(results["scores" + suffix], axis=0)
    n_gt = max(results["num_pos" + suffix], 1)

    idx = np.argsort(scores)[::-1]
    rec = np.cumsum(tp_list[idx]) / n_gt
    fpc = np.cumsum(fp_list[idx]) / n_gt
    return {
        "curve_recall" + suffix: rec,
        "curve_precision" + suffix: rec / np.maximum(rec + fpc, 1e-9),
        "AP" + suffix: average_precision(rec, fpc) * 100,
    }
