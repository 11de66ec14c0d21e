"""Host-side visualization: track overlays and pose-axes renderings.

Parity targets: comet/models/visualizer.py:62 (track-overlay video writer,
save_track_flow:189-247) and save_first_k_pose_images
(train_eval_func_new_cp5.py:383-511, pred vs gt axes projected with K).
Pure numpy + cv2/matplotlib; stays off the device path.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..data.keypoints import denormalize_image


def _color_map(n: int) -> np.ndarray:
    """n distinct BGR colors via HSV wheel."""
    import cv2

    hsv = np.stack(
        [np.linspace(0, 179, n, endpoint=False), np.full(n, 255), np.full(n, 255)],
        axis=-1,
    ).astype(np.uint8)[None]
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0]


def draw_tracks_on_frames(
    images: np.ndarray,  # [S, H, W, 3] normalized floats or uint8
    tracks: np.ndarray,  # [S, N, 2]
    visibility: Optional[np.ndarray] = None,  # [S, N]
    trail: int = 6,
) -> np.ndarray:
    """Render per-frame track overlays with motion trails -> [S, H, W, 3] u8."""
    import cv2

    s, n = tracks.shape[:2]
    colors = _color_map(n)
    frames = []
    for t in range(s):
        img = images[t]
        frame = (
            denormalize_image(img) if img.dtype != np.uint8 else img.copy()
        )
        frame = np.ascontiguousarray(frame[..., ::-1])  # RGB -> BGR
        for i in range(n):
            if visibility is not None and visibility[t, i] < 0.5:
                continue
            x, y = tracks[t, i]
            cv2.circle(frame, (int(round(x)), int(round(y))), 2, colors[i].tolist(), -1)
            for back in range(1, min(trail, t) + 1):
                x0, y0 = tracks[t - back, i]
                x1, y1 = tracks[t - back + 1, i]
                cv2.line(
                    frame,
                    (int(round(x0)), int(round(y0))),
                    (int(round(x1)), int(round(y1))),
                    colors[i].tolist(),
                    1,
                )
        frames.append(frame[..., ::-1])  # back to RGB
    return np.stack(frames)


def save_track_video(
    images: np.ndarray,
    tracks: np.ndarray,
    path: str,
    visibility: Optional[np.ndarray] = None,
    fps: int = 8,
) -> str:
    """Write the track-overlay MP4 (visualizer.py save_video equivalent)."""
    import cv2

    frames = draw_tracks_on_frames(images, tracks, visibility)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        writer.write(f[..., ::-1])
    writer.release()
    return path


def draw_pose_axes(
    image: np.ndarray,  # [H, W, 3] uint8 (or normalized float)
    r_pred: np.ndarray,  # [3, 3] column-vector rotation
    t_pred: np.ndarray,  # [3]
    k: np.ndarray,  # [3, 3]
    r_gt: Optional[np.ndarray] = None,
    t_gt: Optional[np.ndarray] = None,
    axis_len: float = 5.0,
) -> np.ndarray:
    """Project object axes with K and draw pred (solid) vs gt (thin)
    (save_first_k_pose_images equivalent)."""
    import cv2

    img = denormalize_image(image) if image.dtype != np.uint8 else image.copy()
    img = np.ascontiguousarray(img)

    def project(r, t):
        pts = np.float64(
            [[0, 0, 0], [axis_len, 0, 0], [0, axis_len, 0], [0, 0, axis_len]]
        )
        cam = pts @ r.T + t
        pix = cam @ k.T
        return (pix[:, :2] / pix[:, 2:]).astype(int)

    axis_colors = [(0, 0, 255), (0, 255, 0), (255, 0, 0)]

    def draw(r, t, thickness):
        p = project(r, t)
        for i, c in enumerate(axis_colors):
            cv2.line(img, tuple(p[0]), tuple(p[i + 1]), c, thickness)

    if r_gt is not None:
        draw(r_gt, t_gt if t_gt is not None else np.zeros(3), 1)
    draw(r_pred, t_pred, 2)
    return img


def save_pose_axes_images(
    images: Sequence[np.ndarray],
    r_pred: np.ndarray,  # [S, 3, 3]
    t_pred: np.ndarray,  # [S, 3]
    k: np.ndarray,
    out_dir: str,
    r_gt: Optional[np.ndarray] = None,
    t_gt: Optional[np.ndarray] = None,
) -> str:
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    for i, img in enumerate(images):
        rendered = draw_pose_axes(
            np.asarray(img), r_pred[i], t_pred[i], k,
            r_gt[i] if r_gt is not None else None,
            t_gt[i] if t_gt is not None else None,
        )
        cv2.imwrite(os.path.join(out_dir, f"pose_{i:04d}.png"), rendered[..., ::-1])
    return out_dir
