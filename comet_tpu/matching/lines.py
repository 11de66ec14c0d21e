"""Line-segment detection, wireframes, and point+line (GlueStick-style)
matching.

Parity targets (the reference's line stack):
- gluefactory/models/lines/lsd.py — pytlsd LSD detector wrapper;
- gluefactory/models/lines/wireframe.py — junction+line wireframe assembly
  from a point extractor + a line detector, with line-point descriptor
  sampling;
- gluefactory/models/matchers/gluestick.py — see matching/gluestick.py
  for the full joint point+line GNN matcher.

TPU redesign: pytlsd's region-growing C++ is replaced by a static-shape
anchor-marching detector — top-K NMS'd gradient anchors each march a
fixed number of steps along their level-line direction, with the endpoint
chosen by a cumulative gradient-alignment mask (no data-dependent loops,
the whole detector jits). Line descriptors are bilinear samples of any
dense descriptor map along the segment (SOLD2/GlueStick sampling). The
full joint point+line GlueStick matcher lives in matching/gluestick.py
(line-endpoint junction tokens, shared self/cross propagation, line
message passing, unified dustbin assignment).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.bilinear import bilinear_sample
from .matchers import mutual_nearest_neighbor
from .registry import register_model


class LineSegments(NamedTuple):
    segments: jax.Array  # [K, 2, 2] endpoints (x, y) pixels
    scores: jax.Array  # [K] mean gradient magnitude along the segment
    valid: jax.Array  # [K] bool (length + alignment gates)


def image_gradients(gray: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sobel gx, gy for [H, W] in [0, 1]."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], gray.dtype) / 8.0
    img = gray[None, :, :, None]

    def conv(k):
        return jax.lax.conv_general_dilated(
            img, k[..., None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]

    return conv(kx), conv(kx.T)


def detect_line_segments(
    gray: jax.Array,  # [H, W] in [0, 1]
    max_lines: int = 64,
    n_steps: int = 32,
    step: float = 1.5,
    mag_threshold: float = 0.02,
    angle_tol: float = 0.4,
    min_length: float = 8.0,
    nms_radius: int = 4,
) -> LineSegments:
    """Static-shape LSD-equivalent: anchors = NMS'd gradient maxima; each
    anchor marches +-n_steps along its level-line direction (perpendicular
    to the gradient); a step survives while the local gradient stays strong
    AND aligned (|angle diff| < angle_tol, mod pi); the endpoint is the
    last surviving step (cumulative-product mask, so one early outlier
    pixel terminates the walk exactly like region growing would).
    """
    gx, gy = image_gradients(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    theta = jnp.arctan2(gy, gx)  # gradient orientation
    return march_segments_from_fields(
        mag, theta,
        max_lines=max_lines, n_steps=n_steps, step=step,
        mag_threshold=mag_threshold, angle_tol=angle_tol,
        min_length=min_length, nms_radius=nms_radius,
    )


def march_segments_from_fields(
    mag: jax.Array,  # [H, W] edge-strength field (image gradient or learned)
    theta: jax.Array,  # [H, W] NORMAL orientation (perpendicular to lines)
    max_lines: int = 64,
    n_steps: int = 32,
    step: float = 1.5,
    mag_threshold: float = 0.02,
    angle_tol: float = 0.4,
    min_length: float = 8.0,
    nms_radius: int = 4,
) -> LineSegments:
    """Anchor-marching core shared by the LSD-equivalent (fields = Sobel
    gradients) and the DeepLSD-equivalent (fields predicted by a CNN)."""
    h, w = mag.shape

    # anchor selection: strongest gradient pixel PER CELL, then top-K
    # cells. Plain global top-K starves weaker lines — a jagged diagonal's
    # stair-step corners (|g| ~ 0.56) outscore every pixel of a clean
    # straight edge (0.5), so all K anchors landed on one line; per-cell
    # argmax plays the spatial role of LSD's region consumption.
    cell = 2 * nms_radius
    hc, wc = -(-h // cell), -(-w // cell)
    padded = jnp.full((hc * cell, wc * cell), -jnp.inf, mag.dtype)
    padded = padded.at[:h, :w].set(jnp.where(mag > mag_threshold, mag, -jnp.inf))
    cells = padded.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(
        hc * wc, cell * cell
    )
    in_cell = jnp.argmax(cells, axis=-1)  # [hc*wc]
    cell_best = jnp.take_along_axis(cells, in_cell[:, None], axis=-1)[:, 0]
    peak_scores, cidx = jax.lax.top_k(cell_best, max_lines)
    best = in_cell[cidx]
    ay = ((cidx // wc) * cell + best // cell).astype(jnp.float32)
    ax = ((cidx % wc) * cell + best % cell).astype(jnp.float32)
    idx = (ay.astype(jnp.int32) * w + ax.astype(jnp.int32))
    anchor_ok = jnp.isfinite(peak_scores)

    # level-line direction (unit): perpendicular to the anchor gradient
    a_theta = theta[(idx // w), (idx % w)]
    dx = -jnp.sin(a_theta)
    dy = jnp.cos(a_theta)

    def march(sign):
        # positions [K, n_steps, 2]
        t = (jnp.arange(1, n_steps + 1, dtype=jnp.float32) * step)[None, :]
        px = ax[:, None] + sign * dx[:, None] * t
        py = ay[:, None] + sign * dy[:, None] * t
        inside = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)
        pts = jnp.stack(
            [jnp.clip(px, 0, w - 1), jnp.clip(py, 0, h - 1)], axis=-1
        )
        m = bilinear_sample(mag[..., None], pts)[..., 0]
        th = bilinear_sample(theta[..., None], pts)[..., 0]
        # orientation difference mod pi (level lines have 180-deg symmetry)
        dth = jnp.abs(th - a_theta[:, None])
        dth = jnp.minimum(dth, jnp.abs(dth - jnp.pi))
        ok = inside & (m > mag_threshold * 0.5) & (dth < angle_tol)
        alive = jnp.cumprod(ok.astype(jnp.int32), axis=1)  # stop at 1st fail
        length = alive.sum(axis=1).astype(jnp.float32) * step
        return length, (alive * m).sum(1) / jnp.maximum(alive.sum(1), 1)

    len_pos, mag_pos = march(+1.0)
    len_neg, mag_neg = march(-1.0)

    e0 = jnp.stack([ax - dx * len_neg, ay - dy * len_neg], -1)
    e1 = jnp.stack([ax + dx * len_pos, ay + dy * len_pos], -1)
    total_len = len_pos + len_neg
    segments = jnp.stack([e0, e1], axis=1)  # [K, 2, 2]
    scores = (mag_pos * len_pos + mag_neg * len_neg) / jnp.maximum(
        total_len, 1e-6
    )
    valid = anchor_ok & (total_len >= min_length)
    return LineSegments(
        segments=segments,
        scores=jnp.where(valid, scores, 0.0),
        valid=valid,
    )


def sample_line_points(segments: jax.Array, n_samples: int) -> jax.Array:
    """[K, 2, 2] -> [K, n_samples, 2] evenly spaced points along each
    segment (endpoints included) — SOLD2/GlueStick line-point sampling."""
    t = jnp.linspace(0.0, 1.0, n_samples)[None, :, None]
    return segments[:, 0:1] * (1 - t) + segments[:, 1:2] * t


def sample_line_descriptors(
    desc_map: jax.Array,  # [H, W, D] dense descriptors
    segments: jax.Array,  # [K, 2, 2]
    n_samples: int = 5,
) -> jax.Array:
    """[K, n_samples, D] bilinear descriptor samples along each line,
    L2-normalized per point (wireframe.py line descriptor sampling)."""
    h, w = desc_map.shape[:2]
    pts = sample_line_points(segments, n_samples)
    pts = jnp.stack(
        [jnp.clip(pts[..., 0], 0, w - 1), jnp.clip(pts[..., 1], 0, h - 1)],
        axis=-1,
    )
    d = bilinear_sample(desc_map, pts)
    return d / jnp.maximum(
        jnp.linalg.norm(d.astype(jnp.float32), axis=-1, keepdims=True), 1e-8
    ).astype(d.dtype)


def match_lines_nn(
    ldesc0: jax.Array,  # [K0, S, D]
    ldesc1: jax.Array,  # [K1, S, D]
    valid0: Optional[jax.Array] = None,
    valid1: Optional[jax.Array] = None,
    threshold: float = 0.0,
) -> Dict[str, jax.Array]:
    """Baseline line matcher: mutual NN on mean line descriptors, scoring
    by the best of forward/reversed point order (lines are undirected)."""
    m0 = ldesc0.mean(axis=1)
    m1f = ldesc1.mean(axis=1)

    def norm(x):
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8
        )

    return mutual_nearest_neighbor(
        norm(m0), norm(m1f), threshold=threshold, valid0=valid0, valid1=valid1
    )


@register_model(
    "extractor_wireframe",
    {"point_extractor": "extractor_sift", "point_conf": {},
     "line_detector": None, "line_conf": {},
     "max_lines": 64, "n_line_samples": 5},
)
def make_wireframe(
    point_extractor: str = "extractor_sift",
    point_conf: Dict = None,
    line_detector: Optional[str] = None,
    line_conf: Dict = None,
    max_lines: int = 64,
    n_line_samples: int = 5,
):
    """Wireframe extractor (wireframe.py capability): point extractor for
    junctions + a line detector + line descriptors sampled from a
    grayscale-gradient descriptor stand-in (or the point extractor's dense
    map when it provides one).

    ``line_detector``: None uses the in-module LSD-equivalent; a registry
    name (e.g. "lines_deeplsd") swaps in a learned detector — it must be a
    callable gray -> LineSegments (DeepLSDDetector initializes itself with
    random weights on first use if not explicitly initialized)."""
    from .registry import get_model as get_registered

    extract_points = get_registered(point_extractor, **(point_conf or {}))
    detect = None
    if line_detector is not None:
        detect = get_registered(
            line_detector, **{"max_lines": max_lines, **(line_conf or {})}
        )

    def extract(image: jax.Array) -> Dict[str, jax.Array]:
        gray = image.mean(axis=-1) if image.ndim == 3 else image
        pts = extract_points(image)
        if detect is not None:
            if getattr(detect, "params", "absent") is None:
                detect.init(jax.random.PRNGKey(0), gray)
            segs = detect(gray)
        else:
            segs = detect_line_segments(gray, max_lines=max_lines)
        # dense descriptor stand-in: normalized gradient orientation map
        gx, gy = image_gradients(gray)
        desc_map = jnp.stack([gx, gy, jnp.sqrt(gx * gx + gy * gy)], -1)
        ldesc = sample_line_descriptors(desc_map, segs.segments,
                                        n_samples=n_line_samples)
        return {
            **pts,
            "lines": segs.segments,
            "line_scores": segs.scores,
            "line_valid": segs.valid,
            "line_descriptors": ldesc,
        }

    return extract
