"""Sliding-window long-sequence inference with pose chaining.

The reference *intends* a windowed mode (E2Epose2.forward_window:269-612:
windows of ``window_len`` with stride len/2, mirror-padded tail,
teacher-forced overlap initialization, stitched outputs) but the shipped
code is dead and crashes on missing attributes (SURVEY.md §3.6). This is the
working TPU-native design: a static window schedule, one jitted model call
per window shape, and pose composition through the uvz codec so every
window's frame-0-relative encodings chain into a single global trajectory.

Teacher forcing (TeacherForcingScheduler, E2Epose2.py:40-56) is a host-side
decision: during training the chain anchor is the GT pose with probability
tf_ratio, the model's own prediction otherwise.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.quaternions import quat_multiply


class TeacherForcingScheduler:
    """Linear ratio decay start->end over transition_epochs
    (E2Epose2.py:40-56)."""

    def __init__(self, start_ratio=1.0, end_ratio=0.2, transition_epochs=300):
        self.start_ratio = start_ratio
        self.end_ratio = end_ratio
        self.transition_epochs = transition_epochs

    def ratio(self, epoch: int) -> float:
        if epoch >= self.transition_epochs:
            return self.end_ratio
        return self.start_ratio - (self.start_ratio - self.end_ratio) * (
            epoch / self.transition_epochs
        )

    def use_teacher_forcing(self, epoch: int, rng: np.random.Generator) -> bool:
        return bool(rng.random() < self.ratio(epoch))


def window_schedule(total: int, window_len: int) -> List[np.ndarray]:
    """Frame-index windows of length window_len, stride window_len//2, the
    tail mirror-padded (E2Epose2.py:305-316 padding semantics)."""
    step = max(window_len // 2, 1)
    starts = list(range(0, max(total - window_len, 0) + 1, step))
    if not starts:
        starts = [0]
    if starts[-1] + window_len < total:
        starts.append(total - window_len)
    windows = []
    for s in starts:
        idx = np.arange(s, s + window_len)
        # mirror-pad past the end
        over = idx >= total
        idx = np.where(over, 2 * (total - 1) - idx, idx)
        windows.append(idx)
    return windows


def compose_uvz_encodings(
    enc_anchor: jax.Array,  # [7] anchor frame's global encoding (rel frame 0)
    enc_window: jax.Array,  # [W, 7] window encodings (rel window frame 0)
    ratio: jax.Array,
) -> jax.Array:
    """Chain window-relative uvz encodings onto a global anchor.

    Δu/Δv are additive; Δd is multiplicative in (Δd/ratio + 1); quaternions
    compose as q_global = q_window ⊗ q_anchor.
    """
    du = enc_window[:, 0] + enc_anchor[0]
    dv = enc_window[:, 1] + enc_anchor[1]
    dd = ratio * (
        (enc_window[:, 2] / ratio + 1.0) * (enc_anchor[2] / ratio + 1.0) - 1.0
    )
    q = quat_multiply(enc_window[:, 3:7], jnp.broadcast_to(enc_anchor[3:7], enc_window[:, 3:7].shape))
    return jnp.concatenate([jnp.stack([du, dv, dd], -1), q], axis=-1)


def windowed_forward(
    apply_fn: Callable,  # (images [1, W, H, Wd, 3], queries [1, N, 2]) -> dict
    images: jax.Array,  # [1, T, H, W, 3]
    queries: jax.Array,  # [1, N, 2] frame-0 query points
    window_len: int,
    ratio: jax.Array,
    gt_enc: Optional[jax.Array] = None,  # [T, >=7] for teacher forcing
    teacher_force: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run COMET over an arbitrarily long sequence.

    Returns (pred_pose_enc [1, T, 7] global frame-0-relative encodings,
    pred_tracks [1, T, N, 2]). Each window's track queries are re-seeded
    from the previous window's predictions at the window start frame
    (the reference's overlap initialization, E2Epose2.py:338-375).
    """
    t_total = images.shape[1]
    n = queries.shape[1]
    windows = window_schedule(t_total, window_len)

    identity = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    global_enc = [None] * t_total
    global_tracks = [None] * t_total
    global_enc[0] = identity
    global_tracks[0] = queries[0]

    win_queries = queries
    for w_idx, idx in enumerate(windows):
        win_images = images[:, idx]
        out = apply_fn(win_images, win_queries)
        enc_w = out["pred_pose_enc"][0]  # [W, 7] rel window frame 0
        tracks_w = out.get("pred_track")
        anchor_frame = int(idx[0])

        if teacher_force and gt_enc is not None:
            anchor = gt_enc[anchor_frame, :7]
        else:
            anchor = (
                identity if anchor_frame == 0 else global_enc[anchor_frame]
            )
        enc_global = compose_uvz_encodings(anchor, enc_w, ratio)

        for j, frame in enumerate(idx):
            f = int(frame)
            # ONE stitching policy for poses and tracks: later windows
            # refine overlap frames. Window-relative frame 0 never
            # overwrites an existing estimate (its pose is the identity
            # relative to itself; its track is the seeded query, i.e. the
            # previous window's own estimate echoed back).
            if j > 0 or global_enc[f] is None:
                global_enc[f] = enc_global[j]
            if tracks_w is not None and (j > 0 or global_tracks[f] is None):
                global_tracks[f] = tracks_w[0, j]

        # seed the next window's queries from this window's track estimate
        # at the next window start (overlap init)
        if tracks_w is not None and w_idx + 1 < len(windows):
            next_start = int(windows[w_idx + 1][0])
            j_here = list(idx).index(next_start) if next_start in list(idx) else None
            if j_here is not None:
                win_queries = tracks_w[:, j_here]

    enc = jnp.stack([e if e is not None else identity for e in global_enc])
    trk = jnp.stack(
        [t if t is not None else jnp.zeros((n, 2)) for t in global_tracks]
    )
    return enc[None], trk[None]


def windowed_forward_scan(
    apply_fn: Callable,  # (images [1, W, H, Wd, 3], queries [1, N, 2]) -> dict
    images: jax.Array,  # [1, T, H, W, 3]
    queries: jax.Array,  # [1, N, 2] frame-0 query points
    window_len: int,
    ratio: jax.Array,
    gt_enc: Optional[jax.Array] = None,  # [T, >=7] for teacher forcing
    teacher_force: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """In-graph windowed inference: ONE ``lax.scan`` over the static window
    schedule with carried overlap state (stitched pose/track arrays + the
    seeded queries), the long-context plan of SURVEY §5 and the intent of
    the reference's (dead) ``E2Epose2.forward_window:269-612``.

    Semantically equivalent to :func:`windowed_forward` (the host-side
    reference implementation, parity-tested in tests/test_windowed.py) with
    two deliberate reformulations that produce identical numbers:

    - every window scatters ALL its frames (the host loop skips window
      frame 0): the model pins window frame 0 to the identity pose and to
      the seeded query, so the skipped write equals the anchor/seed value
      already stored;
    - the next window's queries gather at the statically precomputed
      overlap position ``j_next`` instead of a host-side index search.

    The model is traced ONCE: T frames at window_len=L dispatch as one XLA
    computation instead of ~2T/L jitted calls with host round-trips
    between them. Mirror-padded windows (window_len > T) can contain
    duplicate frame indices whose scatter order XLA does not define — use
    the host version for that degenerate case.
    """
    t_total = images.shape[1]
    n = queries.shape[1]
    windows = window_schedule(t_total, window_len)

    idx_arr = jnp.asarray(np.stack(windows))  # [n_win, L] static schedule
    # j_next[w]: position of window w+1's start inside window w (-1: keep)
    j_next = []
    for w in range(len(windows)):
        if w + 1 < len(windows):
            nxt = int(windows[w + 1][0])
            here = list(windows[w])
            j_next.append(here.index(nxt) if nxt in here else -1)
        else:
            j_next.append(-1)
    j_next = jnp.asarray(j_next, jnp.int32)

    identity = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    enc0 = jnp.zeros((t_total, 7), jnp.float32).at[0].set(identity)
    trk0 = jnp.zeros((t_total, n, 2), jnp.float32)
    gt_arr = (
        gt_enc[:, :7].astype(jnp.float32)
        if (teacher_force and gt_enc is not None)
        else None
    )

    def body(carry, xs):
        enc_out, trk_out, win_q = carry
        idx, jn = xs
        win_images = jnp.take(images, idx, axis=1)
        out = apply_fn(win_images, win_q)
        enc_w = out["pred_pose_enc"][0].astype(jnp.float32)  # [L, 7]
        tracks_w = out["pred_track"].astype(jnp.float32)  # [1, L, N, 2]
        anchor = (
            gt_arr[idx[0]] if gt_arr is not None else enc_out[idx[0]]
        )
        enc_global = compose_uvz_encodings(anchor, enc_w, ratio)
        enc_out = enc_out.at[idx].set(enc_global)
        trk_out = trk_out.at[idx].set(tracks_w[0])
        seeded = jnp.take(tracks_w, jnp.maximum(jn, 0), axis=1)  # [1, N, 2]
        win_q = jnp.where(jn >= 0, seeded, win_q)
        return (enc_out, trk_out, win_q), None

    (enc, trk, _), _ = jax.lax.scan(body, (enc0, trk0, queries),
                                    (idx_arr, j_next))
    return enc[None], trk[None]
