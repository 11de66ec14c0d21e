"""Camera/trajectory alignment and averaging utilities, pure jnp.

Parity targets: comet/utils/align.py:109,145 (Umeyama-style similarity
alignment of camera extrinsics, corresponding-point alignment) and
comet/utils/utils.py:25,136,190,204 (rotation averaging, relative-to-first
normalization, farthest-point sampling).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.quaternions import quat_invert, quat_multiply, quat_to_matrix


class SimilarityTransform(NamedTuple):
    r: jax.Array  # [3, 3]
    t: jax.Array  # [3]
    s: jax.Array  # []


def corresponding_points_alignment(
    x: jax.Array, y: jax.Array, estimate_scale: bool = True, eps: float = 1e-9
) -> SimilarityTransform:
    """Umeyama alignment: find (R, t, s) minimizing ||s x R + t - y||^2.

    Row-vector convention (x @ R), matching minipytorch3d/PyTorch3D
    corresponding_points_alignment used by align.py:109.
    """
    n = x.shape[0]
    mu_x = x.mean(axis=0)
    mu_y = y.mean(axis=0)
    xc = x - mu_x
    yc = y - mu_y

    cov = xc.T @ yc / n  # [3, 3]
    u, s_vals, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.asarray([1.0, 1.0, 1.0]).at[2].set(d)
    # column-vector rotation taking x->y is V diag U^T; row convention uses
    # its transpose applied as x @ R
    r = (u * diag[None, :]) @ vt

    var_x = (xc**2).sum() / n
    scale = jnp.where(
        estimate_scale, (s_vals * diag).sum() / jnp.maximum(var_x, eps), 1.0
    )
    t = mu_y - scale * mu_x @ r
    return SimilarityTransform(r=r, t=t, s=scale)


def align_camera_extrinsics(
    r_src: jax.Array,  # [S, 3, 3]
    t_src: jax.Array,  # [S, 3]
    r_tgt: jax.Array,
    t_tgt: jax.Array,
    estimate_scale: bool = True,
) -> Tuple[SimilarityTransform, jax.Array, jax.Array]:
    """Align two camera trajectories by their optical centers + mean
    rotation offset (align.py:145 capability). Returns the similarity and
    the transformed (R, T) of the source cameras."""
    # camera centers for row convention x_cam = x @ R + T: C = -T R^T
    c_src = -jnp.einsum("sj,sij->si", t_src, r_src)
    c_tgt = -jnp.einsum("sj,sij->si", t_tgt, r_tgt)
    sim = corresponding_points_alignment(c_src, c_tgt, estimate_scale)

    # compose world similarity with the source cameras (row convention):
    # x_cam = (s x R_sim + t) @ R_src + T_src
    #       = s x (R_sim R_src) + (t @ R_src + T_src)
    r_new = jnp.einsum("ij,sjk->sik", sim.r, r_src)
    t_new = jnp.einsum("j,sjk->sk", sim.t, r_src) + t_src
    return sim, r_new, t_new


def rotation_average(quats: jax.Array) -> jax.Array:
    """Chordal-L2 rotation averaging: principal eigenvector of the outer-
    product accumulator (comet/utils/utils.py:25 capability)."""
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    m = jnp.einsum("ni,nj->ij", q, q)
    _, vecs = jnp.linalg.eigh(m)
    avg = vecs[:, -1]
    return avg * jnp.sign(avg[0] + 1e-12)


def relative_to_first(q: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Re-express a trajectory relative to its first camera
    (comet/utils/utils.py:136,190)."""
    q_rel = quat_multiply(q, quat_invert(q[0:1]))
    t_rel = t - t[0:1]
    return q_rel, t_rel


def average_batch_rotations(rmats: jax.Array) -> jax.Array:
    """Average B independent predictions of N rotations
    (comet/utils/utils.py:136-164 average_batch_rotation_matrices):
    matrices -> quaternions, mean over the batch axis, renormalize, back
    to matrices. Unlike the reference's raw scipy-quat mean, the batch
    quats are first hemisphere-aligned to the first prediction — the
    reference silently averages antipodal representations to ~zero when
    sign conventions differ.

    rmats: [B, N, 3, 3] -> [N, 3, 3]."""
    from ..geometry.quaternions import matrix_to_quat

    q = matrix_to_quat(rmats.reshape(-1, 3, 3)).reshape(
        rmats.shape[0], rmats.shape[1], 4
    )
    sign = jnp.sign(
        jnp.sum(q * q[0:1], axis=-1, keepdims=True) + 1e-12
    )
    mean = jnp.mean(q * sign, axis=0)
    mean = mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)
    return quat_to_matrix(mean)


def average_query_predictions(
    predict_fn,
    num_frames: int,
    query_indices=None,
    rng=None,
    repeat_times: int = 5,
):
    """Multi-query camera-prediction averaging
    (comet/utils/utils.py:25-127 average_camera_prediction): run the
    predictor with several different frames placed first (the pose
    encoding is relative to frame 0, so each query yields an independent
    estimate), undo each reordering, re-express relative to the true
    first frame, and average — rotations on SO(3), translations and
    focals arithmetically. "Almost a free lunch" robustness at inference.

    predict_fn(order [S] int32) -> (r [S, 3, 3], t [S, 3], focal [S, ...])
    for frames *in that order* (the caller reorders its images and maps
    the outputs back — see the test for the one-liner).
    Returns (r_avg [S, 3, 3], t_avg, focal_avg, query_indices)."""
    import numpy as np

    if query_indices is None:
        rng = rng or np.random.default_rng(0)
        repeat_times = min(repeat_times, num_frames)
        query_indices = list(
            rng.choice(num_frames, size=repeat_times, replace=False)
        )
        if 0 not in query_indices:
            query_indices.insert(0, 0)
    rs, ts, fs = [], [], []
    for qi in query_indices:
        order = calculate_index_mappings(int(qi), num_frames)
        r, t, focal = predict_fn(order)
        # undo the reorder (the swap is an involution: order == inverse)
        r, t, focal = switch_tensor_order([r, t, focal], order, axis=0)
        # re-express relative to the TRUE first frame (utils.py:88-97:
        # x_cam = R x + t composed with the inverse of camera 0)
        r0, t0 = r[0], t[0]
        r_rel = jnp.einsum("nij,kj->nik", r, r0)  # R_n R_0^T
        t_rel = t - jnp.einsum("nij,j->ni", r_rel, t0)
        rs.append(r_rel)
        ts.append(t_rel)
        fs.append(focal)
    r_avg = average_batch_rotations(jnp.stack(rs))
    t_avg = jnp.mean(jnp.stack(ts), axis=0)
    f_avg = jnp.mean(jnp.stack(fs), axis=0)
    return r_avg, t_avg, f_avg, list(map(int, query_indices))


def farthest_point_sample(points: jax.Array, k: int) -> jax.Array:
    """Greedy farthest-point sampling of k indices
    (comet/utils/utils.py:204). Static-shape lax.scan."""
    n = points.shape[0]
    d2 = jnp.full((n,), jnp.inf)
    first = jnp.asarray(0, jnp.int32)

    def body(carry, _):
        d2, last = carry
        dist = jnp.sum((points - points[last]) ** 2, axis=-1)
        d2 = jnp.minimum(d2, dist)
        nxt = jnp.argmax(d2).astype(jnp.int32)
        return (d2, nxt), last

    (_, _), idx = jax.lax.scan(body, (d2, first), None, length=k)
    return idx


# ---------------------------------------------------------------------------
# Query-frame selection (comet/utils/utils.py:167-332): orderings that pick
# which frames to run/query first, plus the index swap that places the query
# frame at position 0.
# ---------------------------------------------------------------------------


def calculate_index_mappings(query_index: int, s: int) -> jax.Array:
    """Order that swaps positions 0 and query_index
    (comet/utils/utils.py:167-178)."""
    order = jnp.arange(s)
    order = order.at[0].set(query_index)
    return order.at[query_index].set(0)


def switch_tensor_order(tensors, order: jax.Array, axis: int = 1):
    """Reorder each (optional) tensor along ``axis``
    (comet/utils/utils.py:181-189)."""
    return [
        jnp.take(t, order, axis=axis) if t is not None else None
        for t in tensors
    ]


def generate_rank_by_midpoint(n: int):
    """Frame order by recursive interval midpoints, coarse-to-fine
    (comet/utils/utils.py:234-250): [mid, 0, n-1, quarter points, ...]."""
    mid = (n - 1) // 2
    seq = [mid, 0, n - 1]
    intervals = [(0, mid), (mid, n - 1)]
    while intervals:
        start, end = intervals.pop(0)
        m = start + (end - start) // 2
        if m not in seq:
            seq.append(m)
        if end - start > 1:
            intervals.append((start, m))
            intervals.append((m, end))
    for i in range(n):
        if i not in seq:
            seq.append(i)
    return seq


def generate_rank_by_interval(n: int, k: int):
    """Frame order by stride-k interleaving (comet/utils/utils.py:253-262)."""
    result = []
    for start in range(k):
        result.extend(range(start, n, k))
    return result


def rank_by_feature_similarity(
    frame_features: jax.Array,  # [S, P, C] per-frame patch features
    num_frames: int,
) -> jax.Array:
    """Query-frame ranking by appearance similarity + FPS
    (generate_rank_by_dino, comet/utils/utils.py:265-332).

    The reference runs the frozen DINOv2 backbone and ranks by mean patch
    cosine similarity; here the (backbone-agnostic) features come in as an
    argument — pass models.vit patch tokens for the exact equivalent. The
    most-similar-to-all frame seeds a farthest-point sweep over the
    100-minus-similarity distance matrix, so the selected frames are
    mutually dissimilar (good parallax for SfM)."""
    f = frame_features / jnp.maximum(
        jnp.linalg.norm(frame_features, axis=-1, keepdims=True), 1e-8
    )
    # per-patch frame-to-frame similarity, averaged over patches
    sim = jnp.einsum("spc,tpc->pst", f, f).mean(axis=0)  # [S, S]
    dist = 100.0 - sim
    s = sim.shape[0]
    sim_offdiag = sim - 200.0 * jnp.eye(s)
    start = jnp.argmax(sim_offdiag.sum(axis=1)).astype(jnp.int32)

    # FPS over the precomputed distance matrix, seeded at `start`
    def body(carry, _):
        mind, selected_mask, last = carry
        mind = jnp.minimum(mind, dist[last])
        mind = jnp.where(selected_mask, -jnp.inf, mind)
        nxt = jnp.argmax(mind).astype(jnp.int32)
        return (mind, selected_mask.at[nxt].set(True), nxt), last

    mask0 = jnp.zeros((s,), bool).at[start].set(True)
    (_, _, _), picked = jax.lax.scan(
        body, (jnp.full((s,), jnp.inf), mask0, start), None,
        length=num_frames,
    )
    return picked


def sample_subrange(n: int, idx: int, length: int):
    """Clamp a window of ``length`` frames centered at ``idx`` into
    [0, n) (utils.py:827-848 parity): shifts the window inward at the
    sequence edges so it stays exactly ``length`` long whenever
    n >= length. Returns (start, end) with end exclusive."""
    start = idx - length // 2
    end = start + length
    if start < 0:
        end -= start
        start = 0
    if end > n:
        start -= end - n
        end = n
        if start < 0:
            start = 0
    if (end - start) < length:
        if end < n:
            end = min(n, start + length)
        elif start > 0:
            start = max(0, end - length)
    return start, end
