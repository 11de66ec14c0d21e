"""Train / eval loops: jitted steps + host-side float64 metric block.

Parity target: train_or_eval_fn (comet/models/train_eval_func_new_cp5.py:514-823)
split into pure jitted device functions and a host loop that computes the
float64 metric block (the reference's autocast-double section :632-675) and
accumulates per-scene AUC.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import CometConfig
from ..data.datasets import SequenceSample
from ..data.keypoints import seed_query_points
from ..geometry.cameras import CameraSet
from ..metrics import (
    auc_from_histogram_prefix,
    auc_histogram,
    pairwise_se3_errors,
    relative_frame_errors,
)
from ..models.comet import COMET, decode_predictions, encode_gt, pose_loss
from .stats import RunningStats


def make_gt_cameras(sample: SequenceSample) -> CameraSet:
    """HOST-resident (numpy) gt CameraSet from a dataset sample.

    The leaves stay numpy on purpose: the per-sample gt is consumed by
    the host f64 metric block, and a jnp-backed CameraSet makes every
    ``np.asarray(gt.q)`` there a device fetch — two tunnel round trips
    (~22 ms each) per sequence on this environment's chip. Device
    consumers (jitted eval/train steps, stack_camera_sets) convert numpy
    leaves at dispatch exactly as before."""
    n = sample.q_wxyz.shape[0]
    return CameraSet(
        q=np.asarray(sample.q_wxyz, np.float32),
        t_xyz=np.asarray(sample.t_xyz, np.float32),
        t_uvz=np.asarray(sample.t_uvz, np.float32),
        focal=np.full((n, 2), 1745.0, np.float32),
        pp=np.zeros((n, 2), np.float32),
        ratio=np.float32(sample.ratio).reshape(()),
    )


@functools.lru_cache(maxsize=8)
def build_eval_step(model: COMET, cfg: CometConfig):
    """Jitted device function: images + queries + gt cams -> predictions.

    Memoized on (model, cfg) — both are frozen dataclasses — so repeated
    ``evaluate()`` calls (per-epoch eval in cmd_train, the warmup+timed
    passes of the data benchmark) reuse ONE jitted callable and its
    compile cache. Without this every call re-jitted the step: the data
    bench measured 36 s/sequence, almost all of it one silent ~2-minute
    recompile inside the timed pass."""

    @jax.jit
    def step(params, images, queries, gt_cams: CameraSet):
        out = model.apply(params, images, queries)
        gt_enc = encode_gt(cfg, gt_cams)
        gt_enc_b = gt_enc if gt_enc.ndim == 3 else gt_enc[None]
        losses = pose_loss(cfg, out["pred_pose_enc"], gt_enc_b)
        q_abs, t_abs = decode_predictions(cfg, out["pred_pose_enc"], gt_cams)
        return {
            "pred_pose_enc": out["pred_pose_enc"],
            "gt_pose_enc": gt_enc,
            "pred_q": q_abs,
            "pred_t": t_abs,
            "pred_track": out.get("pred_track"),
            "track_score": out.get("track_score"),
            **losses,
        }

    return step


def build_train_step(model: COMET, cfg: CometConfig, tx: optax.GradientTransformation):
    """Jitted train step: forward + pose loss + masked AdamW update."""

    @jax.jit
    def step(params, opt_state, images, queries, gt_cams: CameraSet):
        def loss_fn(p):
            out = model.apply(p, images, queries)
            gt_enc = encode_gt(cfg, gt_cams)
            gt_enc_b = gt_enc if gt_enc.ndim == 3 else gt_enc[None]
            losses = pose_loss(cfg, out["pred_pose_enc"], gt_enc_b)
            return losses["loss"], (out, losses, gt_enc)

        (loss, (out, losses, gt_enc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        q_abs, t_abs = decode_predictions(cfg, out["pred_pose_enc"], gt_cams)
        aux = {
            "pred_pose_enc": out["pred_pose_enc"],
            "gt_pose_enc": gt_enc,
            "pred_q": q_abs,
            "pred_t": t_abs,
            **losses,
        }
        return params, opt_state, aux

    return step


def build_windowed_train_step(
    model: COMET, cfg: CometConfig, tx: optax.GradientTransformation,
    window_len: int,
):
    """Jitted TEACHER-FORCED windowed train step (VERDICT r3 item 7; the
    reference's design intent in the dead ``E2Epose2.forward_window``
    + ``TeacherForcingScheduler``, E2Epose2.py:269-612, 40-56).

    The whole window chain — ``windowed_forward_scan`` (one ``lax.scan``
    over the static window schedule), the uvz pose composition, and the
    pose loss over ALL stitched frames — differentiates as one graph, so
    gradients flow from late-window losses back through the chained
    anchors into every window's camera-predictor forward. With
    ``teacher_force=True`` the chain anchors come from the GT encodings
    instead of the model's own stitched estimates (scheduled per step by
    the host via ``TeacherForcingScheduler``).

    Contract: batch size 1 (long-sequence mode) — images [1, T, ...],
    queries [1, N, 2], per-sequence gt_cams ([T, ...] arrays).
    """
    from ..models.windowed import windowed_forward_scan

    @functools.partial(jax.jit, static_argnames=("teacher_force",))
    def step(params, opt_state, images, queries, gt_cams: CameraSet,
             teacher_force: bool = False):
        gt_enc = encode_gt(cfg, gt_cams)  # [T, 8]

        def loss_fn(p):
            enc, trk = windowed_forward_scan(
                lambda im, q: model.apply(p, im, q),
                images, queries, window_len, gt_cams.ratio,
                gt_enc=gt_enc, teacher_force=teacher_force,
            )
            losses = pose_loss(cfg, enc, gt_enc[None])
            return losses["loss"], (enc, trk, losses)

        (loss, (enc, trk, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        q_abs, t_abs = decode_predictions(cfg, enc, gt_cams)
        aux = {
            "pred_pose_enc": enc,
            "gt_pose_enc": gt_enc,
            "pred_q": q_abs,
            "pred_t": t_abs,
            "pred_track": trk,
            **losses,
        }
        return params, opt_state, aux

    return step


# The only step-output keys metric_block reads. data_parallel's
# start_metric_fetch uses this to fetch exactly these keys (anything
# else — notably pred_track [B,S,N,2] — is wasted device->host traffic);
# keeping the list NEXT to metric_block makes the coupling explicit, and
# tests/test_training.py asserts every key metric_block touches is here.
METRIC_FETCH_KEYS = (
    "pred_pose_enc", "gt_pose_enc", "pred_q", "pred_t",
    "loss", "loss_trans", "loss_rot",
)


def metric_block(
    step_out: Dict[str, Any], gt_cams: CameraSet, seq_name: str = ""
) -> Dict[str, float]:
    """Host-side float64 metric block (train_eval_func_new_cp5.py:632-675).

    Key-name and axis-mapping parity with the reference:
    X_err = error_euler[2], acc@5deg_x = acc[2], etc.
    """
    pred_q = np.asarray(step_out["pred_q"]).reshape(-1, 4)
    pred_t = np.asarray(step_out["pred_t"]).reshape(-1, 3)
    gt_q = np.asarray(gt_cams.q)
    gt_t = np.asarray(gt_cams.t_xyz)

    pair = pairwise_se3_errors(pred_q, pred_t, gt_q, gt_t, batch_size=1)
    pred_enc = np.asarray(step_out["pred_pose_enc"]).reshape(-1, 7)
    gt_enc = np.asarray(step_out["gt_pose_enc"]).reshape(pred_enc.shape[0], -1)[:, :7]
    rel = relative_frame_errors(pred_enc, gt_enc)

    out: Dict[str, float] = {
        "loss": float(step_out.get("loss", 0.0)),
        "loss_trans": float(step_out.get("loss_trans", 0.0)),
        "loss_rot": float(step_out.get("loss_rot", 0.0)),
        "R_avg": float(rel["avg_rangle_deg"]),
        "T_avg": float(pair["T_rmse_x1e3"]),
        "Tx_mse": float(pair["X_rmse_x1e3"]),
        "Ty_mse": float(pair["Y_rmse_x1e3"]),
        "Tz_mse": float(pair["Z_rmse_x1e3"]),
        # reference axis mapping (train_eval_func_new_cp5.py:644-655)
        "X_err": float(rel["error_euler_xyz"][2]),
        "Y_err": float(rel["error_euler_xyz"][1]),
        "Z_err": float(rel["error_euler_xyz"][0]),
        "acc@5deg_x": float(rel["acc_at_5deg_xyz"][2]),
        "acc@5deg_y": float(rel["acc_at_5deg_xyz"][1]),
        "acc@5deg_z": float(rel["acc_at_5deg_xyz"][0]),
    }
    for th in (5, 10, 15):
        out[f"Racc_him_{th}"] = float((pair["rel_rangle_deg"] < th).mean())
        out[f"Tacc_him_{th}"] = float((pair["rel_tangle_deg"] < th).mean())
    _, hist = auc_histogram(pair["rel_rangle_deg"], pair["rel_tangle_deg"], 30)
    for th in (30, 10, 5, 3):
        out[f"Auc_{th}"] = auc_from_histogram_prefix(hist, th)
    if seq_name:
        out[f"Auc_scene_{seq_name}"] = auc_from_histogram_prefix(hist, 10)
    return out


def _merge_process_averages(stats) -> Dict[str, float]:
    """Merge per-process partial (sum, count) pairs into global averages
    (multi-process mesh eval, ADVICE r3 #5). The metric-block key set is
    identical on every process (same sorted order), so an allgather of
    the aligned (sums, counts) matrix suffices; per-scene AUC keys are
    process-DISJOINT and stay local (the caller aggregates per process
    exactly like the reference's per-rank scene dicts)."""
    from jax.experimental import multihost_utils

    global_keys = sorted(
        k for k in stats._sums if not k.startswith("Auc_scene")
    )
    vec = np.asarray(
        [
            [stats._sums[k] for k in global_keys],
            [float(stats._counts[k]) for k in global_keys],
        ],
        np.float64,
    )
    gathered = multihost_utils.process_allgather(vec)  # [P, 2, K]
    out = {
        k: float(gathered[:, 0, i].sum())
        / max(float(gathered[:, 1, i].sum()), 1.0)
        for i, k in enumerate(global_keys)
    }
    for k in stats._sums:
        if k.startswith("Auc_scene"):
            out[k] = stats._sums[k] / max(stats._counts[k], 1)
    return out


def evaluate(
    model: COMET,
    params,
    dataset,
    cfg: CometConfig,
    keypoint_backend: str = "corners",
    max_sequences: Optional[int] = None,
    print_fn=print,
    print_interval: int = 50,
    mesh=None,
    eval_batch: int = 1,
) -> Dict[str, float]:
    """Sequential eval over a dataset; returns epoch-average metrics.

    ``keypoint_backend`` is a backend name ("corners"/"grid"/"superpoint")
    or a callable ``sample -> [track_num, 2]`` for externally-supplied
    query points (e.g. parity tests that must feed both harnesses the
    same seeds).

    Input decode + keypoint seeding for sequence i+1 runs on a prefetch
    thread while the device evaluates sequence i (north-star "device-side
    prefetch"; the reference hides this behind DataLoader workers,
    train_util.py:866-896).

    ``eval_batch`` > 1 batches sequences per jitted step on a SINGLE
    device (round 4): on the tunneled chip each step pays fixed
    dispatch + fetch latency, so grouping B sequences amortizes it B-fold
    while the prefetch thread keeps decoding."""
    eval_step = build_eval_step(model, cfg)
    stats = RunningStats()
    rng = np.random.default_rng(cfg.train.seed)
    n = len(dataset) if max_sequences is None else min(len(dataset), max_sequences)

    if (mesh is not None and mesh.devices.size > 1) or eval_batch > 1:
        # batched eval: sequences grouped into batches — device-wide and
        # sharded over the 'data' axis under a mesh (VERDICT r2 weak #6),
        # plain leading-axis batches on one device (eval_batch). The tail
        # batch pads by repeating the last sequence; padded rows' metrics
        # are dropped. Multi-process runs (ADVICE r3 #5): each process
        # builds ONLY its local-devices-sized slice of every chunk
        # (shard_batch assembles the global array from process-local
        # rows), and the per-process partial averages merge with a host
        # allgather at the end.
        from ..data.prefetch import prefetch
        from .data_parallel import batch_metrics, build_batch, shard_train_inputs

        meshed = mesh is not None and mesh.devices.size > 1
        d = int(mesh.devices.size) if meshed else int(eval_batch)
        n_proc = jax.process_count() if meshed else 1
        d_local = d // n_proc if n_proc > 1 else d
        p_lo = (jax.process_index() * d_local) if meshed else 0
        rng_local = rng

        def seed(sample):
            if callable(keypoint_backend):
                return np.asarray(keypoint_backend(sample), np.float32)
            frame0 = (
                sample.frame0_u8 if sample.frame0_u8 is not None
                else sample.images[0]
            )
            return seed_query_points(
                frame0, sample.first_mask, cfg.track_num,
                cfg.min_track_num, backend=keypoint_backend, rng=rng_local,
            )

        n_chunks = -(-n // d)

        def produce_chunk(ci: int):
            start = ci * d
            chunk = list(range(start, min(start + d, n)))
            padded = chunk + [chunk[-1]] * (d - len(chunk))
            local_rows = padded[p_lo : p_lo + d_local]
            samples = [dataset[j] for j in local_rows]
            queries = [seed(s) for s in samples]
            return chunk, samples, queries

        def flush(pend):
            # drop padded rows: local row r is real iff its position in
            # the padded chunk indexes a real sequence
            p_ci, p_chunk, p_out, p_gt, p_names = pend
            rows = batch_metrics(p_out, p_gt, seq_names=p_names)
            for r, row in enumerate(rows):
                if p_lo + r < len(p_chunk):
                    stats.update(row)
            if p_ci % print_interval == 0:
                print_fn(stats.status_string(p_ci * d, n, "eval"))

        # chunk i+1 is DISPATCHED before chunk i's metrics are
        # materialized: the device computes i+1 while the host fetches
        # (already-complete, async-started) outputs of i and runs the
        # f64 metric block — on the tunneled chip the fetch + metric
        # math cost ~270 ms/chunk of wall-clock when serialized
        # (tools/profile_data_bench.py round-4 attribution)
        pending = None
        from .data_parallel import start_metric_fetch

        for ci, (chunk, samples, queries) in enumerate(
            prefetch(produce_chunk, n_chunks, depth=2)
        ):
            images, q, gt_b, gt_list = build_batch(samples, queries)
            if meshed:
                images, q, gt_b = shard_train_inputs(mesh, images, q, gt_b)
            out = eval_step(params, images, q, gt_b)
            out = start_metric_fetch(out)
            if pending is not None:
                flush(pending)
            pending = (ci, chunk, out, gt_list,
                       [s.seq_name for s in samples])
        if pending is not None:
            flush(pending)
        if n_proc > 1:
            return _merge_process_averages(stats)
        return stats.averages()

    def produce(i: int):
        sample = dataset[i]
        if callable(keypoint_backend):
            queries = np.asarray(keypoint_backend(sample), np.float32)
        else:
            frame0 = (
                sample.frame0_u8 if sample.frame0_u8 is not None
                else sample.images[0]
            )
            queries = seed_query_points(
                frame0, sample.first_mask, cfg.track_num,
                cfg.min_track_num, backend=keypoint_backend, rng=rng,
            )
        return sample, queries

    from ..data.prefetch import prefetch

    # same deferred-fetch pipeline as the batched path: sequence i+1 is
    # dispatched before sequence i's metrics are materialized, so the
    # fetch + f64 metric math hide behind device compute
    from .data_parallel import start_metric_fetch

    def flush_seq(p):
        pi, pout, pgt, pname = p
        stats.update(metric_block(pout, pgt, pname))
        if pi % print_interval == 0:
            print_fn(stats.status_string(pi, n, "eval"))

    pending = None
    for i, (sample, queries) in enumerate(prefetch(produce, n, depth=3)):
        gt_cams = make_gt_cameras(sample)
        out = eval_step(
            params,
            jnp.asarray(sample.images)[None],
            jnp.asarray(queries)[None],
            gt_cams,
        )
        out = start_metric_fetch(out)
        if pending is not None:
            flush_seq(pending)
        pending = (i, out, gt_cams, sample.seq_name)
    if pending is not None:
        flush_seq(pending)
    return stats.averages()
