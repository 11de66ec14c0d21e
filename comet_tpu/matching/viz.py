"""Two-view match visualization (the viz2d capability).

Parity target: gluefactory/visualization/viz2d.py (plot_images,
plot_keypoints, plot_matches, plot_lines, plot_color_line_matches,
plot_epipolar_lines, plot_heatmaps, cm_RdGn) — rebuilt dependency-light:
cv2 raster drawing onto numpy images instead of matplotlib figures, so it
runs headless and composes with utils/visualize.py's writers. A
matplotlib-based cumulative-error plot (viz2d.py:442) is provided behind a
soft import.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "cm_RdGn",
    "side_by_side",
    "draw_keypoints",
    "draw_matches",
    "draw_lines",
    "draw_line_matches",
    "draw_epipolar_lines",
    "heatmap_overlay",
    "plot_cumulative_errors",
]


def _as_u8(img: np.ndarray) -> np.ndarray:
    """Accept uint8 HxWx3, float [0,1] HxWx3, or grayscale HxW."""
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return np.ascontiguousarray(img)


def cm_RdGn(x: np.ndarray) -> np.ndarray:
    """Red (0) -> green (1) colormap, RGB floats (viz2d.py:36-40)."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)[..., None]
    return x * np.array([0.0, 1.0, 0.0]) + (1.0 - x) * np.array([1.0, 0.0, 0.0])


def side_by_side(
    img0: np.ndarray, img1: np.ndarray, pad: int = 4
) -> Tuple[np.ndarray, int]:
    """Stack two images horizontally (plot_images equivalent).
    Returns (canvas, x-offset of image 1)."""
    a, b = _as_u8(img0), _as_u8(img1)
    h = max(a.shape[0], b.shape[0])
    off = a.shape[1] + pad
    canvas = np.full((h, off + b.shape[1], 3), 255, np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], off:] = b
    return canvas, off


def draw_keypoints(
    image: np.ndarray,
    kpts: np.ndarray,  # [N, 2]
    color: Tuple[int, int, int] = (0, 255, 0),
    radius: int = 2,
    scores: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Dots at keypoints; with ``scores`` in [0,1], red->green per point
    (plot_keypoints, viz2d.py:141-155)."""
    import cv2

    img = _as_u8(image)
    colors = (
        (cm_RdGn(scores) * 255).astype(np.uint8)
        if scores is not None
        else np.tile(np.asarray(color, np.uint8), (len(kpts), 1))
    )
    for (x, y), c in zip(np.asarray(kpts), colors):
        cv2.circle(img, (int(round(x)), int(round(y))), radius, c.tolist(), -1)
    return img


def draw_matches(
    img0: np.ndarray,
    img1: np.ndarray,
    kpts0: np.ndarray,  # [N, 2]
    kpts1: np.ndarray,  # [N, 2], same length: kpts0[i] <-> kpts1[i]
    correct: Optional[np.ndarray] = None,  # [N] bool/float -> red/green
    lw: int = 1,
    ps: int = 3,
) -> np.ndarray:
    """Side-by-side match rendering (plot_matches, viz2d.py:158-219)."""
    import cv2

    canvas, off = side_by_side(img0, img1)
    n = len(kpts0)
    if correct is not None:
        colors = (cm_RdGn(np.asarray(correct, np.float64)) * 255).astype(np.uint8)
    elif n == 0:
        colors = np.zeros((0, 3), np.uint8)
    else:
        # distinct hues per match (the reference samples random hues)
        hsv = np.stack(
            [
                np.linspace(0, 179, n, endpoint=False),
                np.full(n, 200),
                np.full(n, 255),
            ],
            -1,
        ).astype(np.uint8)[None]
        colors = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)[0]
    for (p0, p1), c in zip(zip(np.asarray(kpts0), np.asarray(kpts1)), colors):
        a = (int(round(p0[0])), int(round(p0[1])))
        b = (int(round(p1[0])) + off, int(round(p1[1])))
        cv2.line(canvas, a, b, c.tolist(), lw, cv2.LINE_AA)
        cv2.circle(canvas, a, ps, c.tolist(), -1)
        cv2.circle(canvas, b, ps, c.tolist(), -1)
    return canvas


def draw_lines(
    image: np.ndarray,
    lines: np.ndarray,  # [M, 2, 2] segments
    color: Tuple[int, int, int] = (255, 128, 0),
    lw: int = 2,
    endpoints: bool = True,
) -> np.ndarray:
    """Segment overlay (plot_lines, viz2d.py:355-396)."""
    import cv2

    img = _as_u8(image)
    for (a, b) in np.asarray(lines):
        pa = (int(round(a[0])), int(round(a[1])))
        pb = (int(round(b[0])), int(round(b[1])))
        cv2.line(img, pa, pb, color, lw, cv2.LINE_AA)
        if endpoints:
            cv2.circle(img, pa, lw + 1, color, -1)
            cv2.circle(img, pb, lw + 1, color, -1)
    return img


def draw_line_matches(
    img0: np.ndarray,
    img1: np.ndarray,
    lines0: np.ndarray,  # [M, 2, 2]
    lines1: np.ndarray,  # [M, 2, 2] matched pairwise with lines0
    correct: Optional[np.ndarray] = None,
    lw: int = 2,
) -> np.ndarray:
    """Matched segments in the same color per pair
    (plot_color_line_matches, viz2d.py:399-434)."""
    import cv2

    canvas, off = side_by_side(img0, img1)
    m = len(lines0)
    if correct is not None:
        colors = (cm_RdGn(np.asarray(correct, np.float64)) * 255).astype(np.uint8)
    elif m == 0:
        colors = np.zeros((0, 3), np.uint8)
    else:
        hsv = np.stack(
            [
                np.linspace(0, 179, m, endpoint=False),
                np.full(m, 220),
                np.full(m, 255),
            ],
            -1,
        ).astype(np.uint8)[None]
        colors = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)[0]
    shifted = np.asarray(lines1).copy()
    shifted[..., 0] += off
    for seg0, seg1, c in zip(np.asarray(lines0), shifted, colors):
        for seg in (seg0, seg1):
            cv2.line(
                canvas,
                (int(round(seg[0, 0])), int(round(seg[0, 1]))),
                (int(round(seg[1, 0])), int(round(seg[1, 1]))),
                c.tolist(),
                lw,
                cv2.LINE_AA,
            )
    return canvas


def draw_epipolar_lines(
    img0: np.ndarray,
    img1: np.ndarray,
    f: np.ndarray,  # [3, 3] fundamental matrix, image0 -> image1
    kpts0: np.ndarray,  # [N, 2] points in image 0
    color: Tuple[int, int, int] = (0, 200, 255),
    lw: int = 1,
) -> np.ndarray:
    """Epipolar lines of image-0 points drawn in image 1
    (plot_epipolar_lines / draw_epipolar_line, viz2d.py:259-335)."""
    import cv2

    canvas, off = side_by_side(img0, img1)
    h1, w1 = _as_u8(img1).shape[:2]
    canvas = draw_keypoints(canvas, np.asarray(kpts0), color=color)
    for p in np.asarray(kpts0):
        a, b, c = np.asarray(f, np.float64) @ np.array([p[0], p[1], 1.0])
        # intersect a x + b y + c = 0 with the image-1 border
        pts = []
        if abs(b) > 1e-12:
            for x in (0.0, w1 - 1.0):
                y = -(a * x + c) / b
                if -1 <= y <= h1:
                    pts.append((x, y))
        if abs(a) > 1e-12:
            for y in (0.0, h1 - 1.0):
                x = -(b * y + c) / a
                if -1 <= x <= w1:
                    pts.append((x, y))
        if len(pts) >= 2:
            p0, p1 = pts[0], pts[1]
            cv2.line(
                canvas,
                (int(round(p0[0])) + off, int(round(p0[1]))),
                (int(round(p1[0])) + off, int(round(p1[1]))),
                color,
                lw,
                cv2.LINE_AA,
            )
    return canvas


def heatmap_overlay(
    image: np.ndarray,
    heat: np.ndarray,  # [H, W] floats
    alpha: float = 0.5,
    vmin: float = 0.0,
    vmax: Optional[float] = None,
) -> np.ndarray:
    """Alpha-blend a scalar map over the image (plot_heatmaps,
    viz2d.py:338-352). Blue (low) -> red (high)."""
    img = _as_u8(image).astype(np.float64)
    h = np.asarray(heat, np.float64)
    vmax = float(h.max()) if vmax is None else vmax
    x = np.clip((h - vmin) / max(vmax - vmin, 1e-12), 0.0, 1.0)
    overlay = np.stack([x, np.zeros_like(x), 1.0 - x], -1) * 255.0
    if overlay.shape[:2] != img.shape[:2]:
        import cv2

        overlay = cv2.resize(overlay, (img.shape[1], img.shape[0]))
        x = cv2.resize(x, (img.shape[1], img.shape[0]))
    out = img * (1 - alpha * x[..., None]) + overlay * (alpha * x[..., None])
    return out.astype(np.uint8)


def plot_cumulative_errors(
    errors: dict,  # name -> 1-D array of errors
    thresholds: Sequence[float] = (1.0, 50.0),
    path: Optional[str] = None,
):
    """Cumulative error curves (plot_cumulative, viz2d.py:442-478).
    Returns the matplotlib figure, or None when matplotlib is missing."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover - matplotlib always in this env
        return None
    fig, ax = plt.subplots(figsize=(6, 4))
    xs = np.linspace(thresholds[0], thresholds[1], 256)
    for name, errs in errors.items():
        e = np.sort(np.asarray(errs, np.float64))
        frac = [np.mean(e <= x) for x in xs]
        ax.plot(xs, frac, label=name)
    ax.set_xlabel("error threshold")
    ax.set_ylabel("fraction of pairs")
    ax.set_ylim(0, 1)
    ax.legend()
    fig.tight_layout()
    if path is not None:
        fig.savefig(path, dpi=100)
    return fig


def make_match_figures(pred: dict, data: dict, n_pairs: int = 2):
    """Batch-level training-figure renderer (visualize_batch.py:7-58
    parity, headless): for the first ``n_pairs`` of a training batch,
    draw predicted matches color-coded by GT correctness (RdGn) with all
    keypoints overlaid. Returns {"matching": [np.uint8 image per pair]}.

    pred: keypoints0/1 [B, N, 2], matches0 [B, N], gt_matches0 [B, N];
    data: image0/image1 [B, H, W, (3)] floats in [0, 1].
    """
    kp0 = np.asarray(pred["keypoints0"])
    kp1 = np.asarray(pred["keypoints1"])
    m0 = np.asarray(pred["matches0"])
    gtm0 = np.asarray(pred["gt_matches0"])
    img0 = np.asarray(data["image0"])
    img1 = np.asarray(data["image1"])

    figures = []
    for i in range(min(n_pairs, kp0.shape[0])):
        # the reference draws predicted matches whose GT label is not
        # IGNORE (-2): valid = (m0 > -1) & (gtm0 >= -1)
        valid = (m0[i] > -1) & (gtm0[i] >= -1)
        kpm0 = kp0[i][valid]
        kpm1 = kp1[i][m0[i][valid]]
        correct = gtm0[i][valid] == m0[i][valid]
        canvas = draw_matches(
            img0[i], img1[i], kpm0, kpm1, correct=correct, ps=0, lw=1
        )
        # all keypoints in royal blue underneath (visualize_batch.py:52)
        off = canvas.shape[1] - img1[i].shape[1]
        canvas = draw_keypoints(canvas, kp0[i], color=(65, 105, 225))
        kp1_off = np.asarray(kp1[i], np.float64) + np.asarray([off, 0.0])
        canvas = draw_keypoints(canvas, kp1_off, color=(65, 105, 225))
        figures.append(canvas)
    return {"matching": figures}
