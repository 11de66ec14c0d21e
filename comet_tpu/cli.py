"""Command-line interface: ``python -m comet_tpu.cli <train|eval|demo|bench|match>``.

Replaces the reference's four entry scripts (abl_ours.py, abl_test.py,
test_e2epose2.py, train_e2epose2.py — which must be run from comet/models/
with a hand-tuned PYTHONPATH and contain a dead training loop) with one CLI:

  eval  --preset ours --data-root datasets/AMD/AMD_eval --output-dir out
  train --preset ours --data-root datasets/AMD --epochs 300
  demo  --preset ours --data-root datasets/DCA_SpaceNet/model1/testing
  bench --preset ours
  match --experiment superpoint+lightglue_homography [--train]

Writes test_results.csv rows compatible with the reference's CsvLogger.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time


def _common(parser):
    parser.add_argument("--preset", default="ours", help="ours|abl_all|abl_track|abl_time|abl_uvz")
    parser.add_argument("--data-root", default=None)
    parser.add_argument("--output-dir", default="outputs")
    parser.add_argument("--seqlen", type=int, default=None)
    parser.add_argument("--img-size", type=int, default=None)
    parser.add_argument("--track-num", type=int, default=None)
    parser.add_argument("--dataset", default=None, help="intrinsics key override")
    parser.add_argument("--checkpoint", default=None, help="orbax checkpoint dir or converted .msgpack")
    parser.add_argument("--keypoints", default="corners", help="corners|grid|superpoint")
    parser.add_argument("--max-sequences", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--f32", action="store_true", help="disable bf16 compute")
    parser.add_argument(
        "--device-preprocess", action="store_true",
        help="run crop/resize/normalize jitted on device (default host "
        "path is PIL LANCZOS reference-parity). Applies to every "
        "dataset-constructing subcommand (eval/train/demo); bench uses "
        "synthetic device-resident tensors and ignores it",
    )
    parser.add_argument(
        "--device-resample", default="bilinear",
        choices=["bilinear", "lanczos"],
        help="device-preprocess filter: bilinear (cheapest) or lanczos "
        "(the reference's PIL filter as sampling matrices — matches the "
        "host path to PIL's uint8 rounding)",
    )
    parser.add_argument(
        "--loader", default="pil", choices=["pil", "native"],
        help="frame loader: pil (reference-parity host path) or native "
        "(C++ cometio: threaded libjpeg/libpng decode + PIL-bit-exact "
        "LANCZOS — identical samples, ~3x faster host side)",
    )
    parser.add_argument(
        "--eval-batch", type=int, default=1,
        help="eval: sequences batched per jitted step on one device "
        "(amortizes per-step dispatch/fetch latency; the data bench "
        "defaults to 4)",
    )
    parser.add_argument(
        "--demo-seq-len", type=int, default=None,
        help="demo: total frames per sequence; when > seqlen the model runs "
        "in sliding windows of seqlen with pose chaining (windowed mode)",
    )


def _build(args):
    import jax

    from .config import get_config

    cfg = get_config(args.preset)
    overrides = {}
    if args.seqlen:
        overrides["seqlen"] = args.seqlen
    if args.img_size:
        overrides["img_size"] = args.img_size
    if args.track_num:
        overrides["track_num"] = args.track_num
    if args.dataset:
        overrides["dataset"] = args.dataset
    if args.data_root:
        overrides["data_root"] = args.data_root
    if args.f32:
        overrides["compute_dtype"] = "float32"
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


def _finite_json(obj):
    """json.dumps-safe copy: non-finite floats become None (json.dumps
    would emit bare Infinity/NaN, which is not valid JSON)."""
    import math

    if isinstance(obj, dict):
        return {k: _finite_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_finite_json(v) for v in obj]
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    return obj


def _maybe_device_preprocess(dataset, args, keep_on_device=False):
    """Wrap a dataset in the requested preprocessing fast path (XLA
    device pipeline or the native C++ loader). ``keep_on_device`` skips
    the f32 device->host round trip for consumers that feed the images
    straight back to the device (the eval loop)."""
    device = getattr(args, "device_preprocess", False)
    native_loader = getattr(args, "loader", "pil") == "native"
    if device:
        from .data.device_pipeline import DevicePreprocessDataset

        # --loader native composes with --device-preprocess (round 4):
        # C++ threaded raw decode on the host, crop/resize/normalize as
        # one jitted graph on the accelerator
        return DevicePreprocessDataset(
            dataset, resample=getattr(args, "device_resample", "bilinear"),
            keep_on_device=keep_on_device,
            decode="native" if native_loader else "pil",
        )
    if native_loader:
        from .data.native_loader import NativeLoaderDataset

        return NativeLoaderDataset(dataset)
    return dataset


def _init_model(cfg, seed=0, checkpoint=None, inference=True):
    import jax
    import jax.numpy as jnp

    from .models import COMET

    model = COMET(cfg)
    dummy_imgs = jnp.zeros((1, cfg.seqlen, cfg.img_size, cfg.img_size, 3), jnp.float32)
    dummy_q = jnp.full((1, cfg.track_num, 2), cfg.img_size / 2.0, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), dummy_imgs, dummy_q)
    if checkpoint:
        from .training.checkpoints import restore_checkpoint
        from .utils.serialization import load_params_msgpack

        if checkpoint.endswith(".msgpack"):
            params = load_params_msgpack(checkpoint, params)
        else:
            params = restore_checkpoint(checkpoint, params)
    if inference:
        # one-time compute-dtype cast (f32 masters are a training concern)
        from .utils import cast_params_for_inference

        params = cast_params_for_inference(params, cfg.dtype)
    return model, params


def cmd_eval(args):
    from .data import AMDDataset
    from .training import CsvLogger, evaluate

    cfg = _build(args)
    model, params = _init_model(cfg, args.seed, args.checkpoint)
    dataset = AMDDataset(
        cfg.data_root, crop_size=cfg.img_size, seq_len=cfg.seqlen, use_augs=False
    )
    # XLA fast path: host decodes, device crops/resizes/normalizes
    # (bilinear; the default host path keeps LANCZOS reference parity)
    dataset = _maybe_device_preprocess(dataset, args, keep_on_device=True)
    os.makedirs(args.output_dir, exist_ok=True)
    logger = CsvLogger(os.path.join(args.output_dir, "test_results.csv"))
    t0 = time.time()
    metrics = evaluate(
        model, params, dataset, cfg,
        keypoint_backend=args.keypoints, max_sequences=args.max_sequences,
        eval_batch=getattr(args, "eval_batch", 1) or 1,
    )
    metrics["lr"] = 0.0
    logger.log(0, metrics)
    elapsed = time.time() - t0
    n = min(len(dataset), args.max_sequences or len(dataset))
    print(json.dumps({k: round(v, 5) for k, v in sorted(metrics.items()) if not k.startswith("Auc_scene")}, indent=2))
    print(f"sequences/sec: {n / elapsed:.3f}")


def cmd_train(args):
    import jax

    from .data import AMDDataset, seed_query_points
    from .training import (
        CsvLogger,
        RunningStats,
        TrainingMonitor,
        build_optimizer,
        build_train_step,
        evaluate,
        save_checkpoint,
        auto_resume,
    )
    from .training.data_parallel import fit_epoch, process_local_order
    from .parallel.mesh import make_mesh
    from .training.data_parallel import replicate_train_state

    # multi-process data parallel over DCN: join the cluster BEFORE any
    # device query (the jax-native stand-in for torch.distributed
    # init_process_group, gluefactory/train.py:237-241). Tested end-to-end
    # by tests/test_multiprocess.py.
    if getattr(args, "coordinator", None):
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    cfg = _build(args)
    train_over = {}
    if args.epochs is not None:
        train_over["epochs"] = args.epochs
    if args.ckpt_interval is not None:
        train_over["ckpt_interval"] = args.ckpt_interval
    if args.eval_interval is not None:
        train_over["eval_interval"] = args.eval_interval
    if train_over:
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_over))
    # keep float32 master params for training
    model, params = _init_model(cfg, args.seed, args.checkpoint, inference=False)

    import numpy as np

    windowed = getattr(args, "windowed", False)
    train_seq_len = (
        (getattr(args, "train_seq_len", None) or 2 * cfg.seqlen)
        if windowed else cfg.seqlen
    )
    train_ds = AMDDataset(
        os.path.join(cfg.data_root, "AMD_train"), crop_size=cfg.img_size,
        seq_len=train_seq_len, use_augs=True, seed=cfg.train.seed,
    )
    eval_ds = AMDDataset(
        os.path.join(cfg.data_root, "AMD_eval"), crop_size=cfg.img_size,
        seq_len=cfg.seqlen, use_augs=False,
    )
    train_ds = _maybe_device_preprocess(train_ds, args)
    eval_ds = _maybe_device_preprocess(eval_ds, args)

    # data-parallel topology: a (data,) mesh over n_devices, batches
    # sharded on the leading axis, params/opt replicated. 1 device ==
    # plain single-chip training through the same code path.
    # mesh width counts GLOBAL devices (all processes); with one process
    # this is just the local device count
    n_devices = args.n_devices or jax.device_count()
    global_batch = args.global_batch or n_devices
    local_len = len(
        range(jax.process_index(), len(train_ds), jax.process_count())
    )
    if jax.process_count() > 1:
        # ADVICE r3 #4: in multi-process runs the mesh MUST span every
        # process's devices (jit rejects non-addressable shards under a
        # prefix mesh), and an uneven global batch would silently floor
        # each process's share — error out instead of shrinking.
        n_devices = jax.device_count()
        if global_batch % jax.process_count() != 0:
            raise SystemExit(
                f"--global-batch {global_batch} must be divisible by the "
                f"process count {jax.process_count()}"
            )
        if global_batch % n_devices != 0:
            raise SystemExit(
                f"--global-batch {global_batch} must be divisible by the "
                f"global device count {n_devices} (one mesh row per device)"
            )
        local_batch = global_batch // jax.process_count()
        if 0 < local_len < local_batch:
            raise SystemExit(
                f"dataset shard ({local_len} sequences/process) smaller "
                f"than the per-process batch {local_batch}; lower "
                f"--global-batch"
            )
    else:
        local_batch = max(global_batch, 1)
        # Tiny datasets: batches are drop_last (static shapes), so a batch
        # wider than the local shard would yield ZERO steps per epoch.
        # Clamp the batch to the data, and the mesh to a width that
        # divides the batch (the leading axis must shard evenly).
        if 0 < local_len < local_batch:
            local_batch = local_len
            global_batch = local_batch
            print(
                f"note: dataset smaller than the requested batch — clamped "
                f"to global batch {global_batch}"
            )
        n_devices = math.gcd(n_devices, global_batch)
    mesh = (
        make_mesh(n_data=n_devices)
        if (n_devices > 1 or jax.process_count() > 1)
        else None
    )
    steps_per_epoch = max(local_len // local_batch, 1)
    print(
        f"data-parallel: {n_devices} device(s) x {jax.process_count()} "
        f"process(es), global batch {global_batch}, "
        f"{steps_per_epoch} steps/epoch"
    )
    tx, schedule = build_optimizer(
        params, cfg.train.lr, steps_per_epoch, cfg.train.restart_num,
        cfg.train.warmup_ratio, cfg.train.warmup_lr_init, cfg.train.clip_grad,
    )
    opt_state = tx.init(params)
    if windowed:
        from .training.loop import build_windowed_train_step

        train_step = build_windowed_train_step(model, cfg, tx, cfg.seqlen)
        tf_sched = None
        if args.tf_start > 0:
            from .models.windowed import TeacherForcingScheduler

            tf_sched = TeacherForcingScheduler(
                args.tf_start, args.tf_end, args.tf_epochs
            )
        print(
            f"windowed training: T={train_seq_len} frames in windows of "
            f"{cfg.seqlen}, teacher forcing "
            + (f"{args.tf_start} -> {args.tf_end} over {args.tf_epochs} "
               f"epochs" if tf_sched else "off")
        )
    else:
        train_step = build_train_step(model, cfg, tx)

    ckpt_dir = os.path.join(args.output_dir, "ckpt")
    start_epoch = 0
    resume_epoch, restored = auto_resume(ckpt_dir, {"params": params, "opt": opt_state})
    if resume_epoch > 0:
        start_epoch = resume_epoch
        params, opt_state = restored["params"], restored["opt"]
        print(f"resumed from epoch {start_epoch}")
    if mesh is not None:
        params, opt_state = replicate_train_state(mesh, params, opt_state)

    # the training CSV adds loss columns ahead of the reference's metric
    # tuple (the reference comments "loss" out of TO_PLOT_METRICS,
    # train_util.py:97 — useless for a training log); eval CSVs keep the
    # reference-parity fieldnames
    from .training.stats import TO_PLOT_METRICS

    logger = CsvLogger(
        os.path.join(args.output_dir, "train_results.csv"),
        fieldnames=("loss", "loss_rot", "loss_trans", "tf_ratio",
                    *TO_PLOT_METRICS),
    )
    try:
        from .training.stats import write_live_dashboard

        dash = write_live_dashboard(logger.path)
        print(f"live dashboard: {dash} (open in a browser; auto-refreshes)")
    except OSError as exc:  # pragma: no cover - fs dependent
        print(f"warning: dashboard write failed ({exc!r})")
    monitor = TrainingMonitor(os.path.join(args.output_dir, "anomaly_checkpoints"))
    rng = np.random.default_rng(cfg.train.seed)
    global_step = start_epoch * steps_per_epoch

    def seed_fn(sample):
        return seed_query_points(
            sample.images[0], sample.first_mask, cfg.track_num,
            cfg.min_track_num, backend=args.keypoints, rng=rng,
        )

    for epoch in range(start_epoch, cfg.train.epochs):
        stats = RunningStats()
        order = process_local_order(rng, len(train_ds))

        def on_metrics(step_i, rows, _epoch=epoch):
            nonlocal global_step
            for row in rows:
                monitor.check(row["loss"], global_step, {"epoch": _epoch})
                row["lr"] = float(schedule(global_step))
                stats.update(row)
            global_step += 1
            if step_i % cfg.train.print_interval == 0:
                print(stats.status_string(step_i, steps_per_epoch, "train"))

        if windowed:
            # long-sequence teacher-forced training: batch 1, one
            # in-graph windowed scan per sequence (no mesh batching —
            # the sequence axis IS the work)
            from .training.loop import make_gt_cameras, metric_block

            import jax.numpy as jnp

            tf_ratio = tf_sched.ratio(epoch) if tf_sched else 0.0
            for step_i, seq_idx in enumerate(order):
                sample = train_ds[seq_idx]
                queries = seed_fn(sample)
                gt_cams = make_gt_cameras(sample)
                use_tf = bool(
                    tf_sched and tf_sched.use_teacher_forcing(epoch, rng)
                )
                params, opt_state, aux = train_step(
                    params, opt_state,
                    jnp.asarray(sample.images)[None],
                    jnp.asarray(queries)[None],
                    gt_cams, teacher_force=use_tf,
                )
                row = metric_block(aux, gt_cams)
                row["tf_ratio"] = tf_ratio
                on_metrics(step_i, [row])
        else:
            params, opt_state, _ = fit_epoch(
                train_step, params, opt_state, train_ds, seed_fn,
                local_batch, order, mesh=mesh, on_metrics=on_metrics,
            )

        logger.log(epoch, stats.averages())
        if epoch > 0:
            # per-metric training curves (VizStats plot_stats equivalent);
            # chart failures (missing matplotlib, headless backend) must
            # never kill a training run
            try:
                from .training.stats import plot_metrics_png

                plot_metrics_png(logger.path)
            except Exception as exc:  # pragma: no cover - env dependent
                print(f"warning: metric plot failed ({exc!r})")
        if (epoch + 1) % cfg.train.ckpt_interval == 0:
            save_checkpoint(ckpt_dir, epoch, {"params": params, "opt": opt_state})
        if (epoch + 1) % cfg.train.eval_interval == 0:
            eval_metrics = evaluate(
                model, params, eval_ds, cfg, keypoint_backend=args.keypoints,
                max_sequences=args.max_sequences, mesh=mesh,
            )
            print("eval:", {k: round(v, 4) for k, v in eval_metrics.items() if not k.startswith("Auc_scene")})
            _maybe_save_best(ckpt_dir, params, eval_metrics, epoch,
                             key=args.best_key)


def _maybe_save_best(ckpt_dir, params, eval_metrics, epoch, key="Auc_30"):
    """Weights-only best checkpoint, tracked by an eval metric
    (the reference's ckpt/best.bin, selected like gluefactory
    train.py:547-556 via train.best_key). Higher is better for the
    Auc_*/\\*acc keys; *_err/R_avg/T_avg keys are minimized. The running
    best survives auto-resume via a JSON sidecar."""
    import json as _json

    from .utils.serialization import save_params_msgpack

    if key not in eval_metrics:
        print(f"warning: best-key {key!r} not in eval metrics; skipping best")
        return
    minimize = key.endswith("_err") or key in ("R_avg", "T_avg", "loss")
    value = float(eval_metrics[key])
    os.makedirs(ckpt_dir, exist_ok=True)
    sidecar = os.path.join(ckpt_dir, "best.json")
    prev = None
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            prev = _json.load(f)
        if prev.get("key") != key:
            prev = None  # metric changed: restart tracking
    better = prev is None or (
        value < prev["value"] if minimize else value > prev["value"]
    )
    if better:
        save_params_msgpack(os.path.join(ckpt_dir, "best.msgpack"), params)
        with open(sidecar, "w") as f:
            _json.dump({"key": key, "value": value, "epoch": epoch}, f)
        print(f"new best {key}={value:.5f} (epoch {epoch}) -> best.msgpack")


def cmd_demo(args):
    """DCA_SpaceNet demo: JSON trajectory/metric export per sequence
    (parity with test_e2epose2.py + train_eval_func_new_cp5.py:679-767)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data import DCADataset, seed_query_points
    from .training import build_eval_step, make_gt_cameras, metric_block
    from .utils.export import export_sequence_json

    cfg = _build(args).replace(dataset="AMD_test")
    model, params = _init_model(cfg, args.seed, args.checkpoint)
    demo_seq_len = args.demo_seq_len or cfg.seqlen
    dataset = DCADataset(
        cfg.data_root, crop_size=cfg.img_size, seq_len=demo_seq_len,
        use_augs=False,
    )
    dataset = _maybe_device_preprocess(dataset, args)
    eval_step = build_eval_step(model, cfg)

    from .models.windowed import windowed_forward_scan

    # one jitted callable for ALL long sequences (jax.jit caches per input
    # shape, so equal-length sequences reuse the compiled scan). params
    # MUST be an argument: closing over them embeds 253M weights as
    # program constants (a ~500 MB serialized computation — rejected by
    # the remote-compile transport outright)
    def _windowed(p, im, q, r):
        return windowed_forward_scan(
            lambda wi, wq: model.apply(p, wi, wq), im, q, cfg.seqlen, r
        )

    windowed_jit_ = jax.jit(_windowed)

    def windowed_jit(im, q, r):
        return windowed_jit_(params, im, q, r)
    rng = np.random.default_rng(cfg.train.seed)
    n = min(len(dataset), args.max_sequences or len(dataset))
    for i in range(n):
        sample = dataset[i]
        queries = seed_query_points(
            sample.images[0], sample.first_mask, cfg.track_num,
            cfg.min_track_num, backend=args.keypoints, rng=rng,
        )
        gt_cams = make_gt_cameras(sample)
        t_total = sample.images.shape[0]
        if t_total > cfg.seqlen:
            # long sequence: sliding windows of seqlen with pose chaining
            # (the reference's intended forward_window mode, reimplemented
            # in models/windowed.py)
            from .models.comet import decode_predictions, encode_gt

            # in-graph scan variant: ONE dispatch for the whole sequence
            # (t_total > seqlen guarantees no mirror-padded duplicate
            # frames, the only case reserved for the host version); the
            # host windowed_forward remains the semantic reference
            # (parity-tested in tests/test_windowed.py)
            enc, tracks = windowed_jit(
                jnp.asarray(sample.images)[None],
                jnp.asarray(queries)[None],
                jnp.asarray(sample.ratio),
            )
            q_abs, t_abs = decode_predictions(cfg, enc, gt_cams)
            out = {
                "pred_pose_enc": enc,
                "gt_pose_enc": encode_gt(cfg, gt_cams),
                "pred_q": q_abs,
                "pred_t": t_abs,
                "pred_track": tracks,
                "track_score": None,
            }
        else:
            out = eval_step(
                params, jnp.asarray(sample.images)[None],
                jnp.asarray(queries)[None], gt_cams,
            )
        metrics = metric_block(out, gt_cams, sample.seq_name)
        json_path = export_sequence_json(
            args.output_dir, sample.seq_name, out, gt_cams, metrics
        )

        # 3-D scene export (GLB point cloud + camera frusta; parity with
        # the reference's trimesh/gradio scene viewer, gradio.py:50-231):
        # triangulate the predicted tracks with the predicted cameras in
        # crop space (fx*ratio, center = crop/2 — the uv codec's own
        # convention, utils.py:631-688)
        from .geometry.quaternions import quat_to_matrix
        from .twoview.triangulation import (
            projection_matrices,
            triangulate_tracks,
        )
        from .utils.scene_export import export_glb_scene

        q = jnp.asarray(out["pred_q"][0])  # [S, 4] wxyz
        t = jnp.asarray(out["pred_t"][0])  # [S, 3]
        tracks = jnp.asarray(out["pred_track"][0])  # [S, N, 2] crop px
        ratio = float(np.asarray(sample.ratio))
        fx = float(np.asarray(gt_cams.focal[0, 0])) * ratio
        fy = float(np.asarray(gt_cams.focal[0, 1])) * ratio
        c0 = cfg.img_size / 2.0
        k_mat = jnp.asarray(
            [[fx, 0.0, c0], [0.0, fy, c0], [0.0, 0.0, 1.0]], jnp.float32
        )
        proj = projection_matrices(q, t, k_mat)
        # weight observations by the model's own track confidence (the
        # normalized inverse heatmap-std, E2Epose2.py:232-239) so occluded
        # or drifting tracks don't pollute the exported point cloud
        if out.get("track_score") is not None:
            mask = jnp.asarray(out["track_score"][0], jnp.float32)
        else:
            mask = jnp.ones(tracks.shape[:2], jnp.float32)
        pts3d = np.asarray(triangulate_tracks(proj, tracks, mask))
        # per-point color from the (denormalized) first frame
        img0 = np.asarray(sample.images[0])
        mean = np.array([0.485, 0.456, 0.406])
        std = np.array([0.229, 0.224, 0.225])
        xy = np.clip(
            np.asarray(tracks[0]).round().astype(int), 0, cfg.img_size - 1
        )
        cols = np.clip(img0[xy[:, 1], xy[:, 0]] * std + mean, 0, 1)
        # row-convention R (x_cam = x_world @ R + T) -> column-convention
        # world-to-camera rotation is R^T
        rs = np.swapaxes(np.asarray(quat_to_matrix(q)), -1, -2)
        glb_path = os.path.join(
            args.output_dir, f"{sample.seq_name.replace('/', '_')}_scene.glb"
        )
        export_glb_scene(glb_path, pts3d, cols, list(rs), list(np.asarray(t)))

        # interactive HTML viewer (offline gradio.py:50 equivalent) +
        # reprojection overlay video (utils.py:437 capability)
        from .utils.scene_export import export_scene_html
        from .utils.visualize import save_reprojection_video

        base = glb_path[: -len(".glb")]
        export_scene_html(
            base + ".html", pts3d, cols, np.asarray(q), np.asarray(t)
        )
        keep = np.asarray(mask.sum(0) > 0)
        try:
            save_reprojection_video(
                base + "_reproj.mp4", np.asarray(sample.images),
                pts3d, np.asarray(quat_to_matrix(q)), np.asarray(t),
                np.asarray(k_mat), valid=keep,
            )
        except Exception as exc:  # pragma: no cover - cv2 codec dependent
            print(f"warning: reprojection video failed ({exc!r})")

        # COLMAP text model (tensor_to_pycolmap.py:16 equivalent): the
        # same cameras/points in the standard sparse-model format so
        # COLMAP-ecosystem tools (gui, MVS, nerf pipelines) load the demo
        # reconstruction directly
        from .utils.colmap_io import batch_to_colmap, write_model_text

        s = int(tracks.shape[0])
        ext = np.concatenate([rs, np.asarray(t)[..., None]], axis=-1)
        colmap_dir = base + "_colmap"
        write_model_text(
            batch_to_colmap(
                pts3d,
                ext,
                np.broadcast_to(np.asarray(k_mat), (s, 3, 3)),
                np.asarray(tracks),
                np.asarray(mask) > 0.5,
                (cfg.img_size, cfg.img_size),
                shared_camera=True,
                rgb=np.clip(cols * 255.0, 0, 255).astype(np.uint8),
            ),
            colmap_dir,
        )
        print(
            f"saved {json_path} + {os.path.basename(glb_path)}"
            f" (+.html, +_reproj.mp4, +_colmap/)  R_avg={metrics['R_avg']:.3f}"
        )


def cmd_bench(args):
    from .bench_lib import (
        run_benchmark,
        run_eval_data_benchmark,
        run_train_benchmark,
    )

    cfg = _build(args)
    which = args.suite
    if which in ("infer", "all"):
        print(json.dumps(run_benchmark(cfg, warmup=3, reps=10)))
    if which in ("train", "all"):
        print(json.dumps(run_train_benchmark(cfg, warmup=2, reps=6)))
    if which in ("data", "all"):
        print(json.dumps(run_eval_data_benchmark(
            cfg, data_root=args.data_root,
            max_sequences=args.max_sequences or 16,
        )))


def cmd_export(args):
    """AOT serving export: serialize the jitted flagship forward to a
    portable jax.export/StableHLO artifact + JSON manifest sidecar.

    The serving process loads the artifact and calls it — no model
    Python needed (utils/serving.py; the reference instead re-imports
    the full torch model class to serve best.bin, test_e2epose2.py:46-94).
    Weights stay a runtime input: one artifact serves every checkpoint
    of its configuration (restore one with serving.params_from_msgpack).
    """
    from .utils import serving
    from .models import COMET

    cfg = _build(args)
    model = COMET(cfg)
    platforms = [p.strip() for p in args.platforms.split(",")] if args.platforms else None
    extra = {"preset": args.preset}
    if args.seq_frames:
        # long-sequence serving: the whole sliding-window chain as ONE
        # lax.scan graph (models/windowed.windowed_forward_scan)
        exp = serving.export_windowed(
            model, cfg, total_frames=args.seq_frames, platforms=platforms,
            params_dtype=cfg.dtype,
        )
        stem = f"comet_{args.preset}_windowed{args.seq_frames}"
        extra["total_frames"] = args.seq_frames
    else:
        exp = serving.export_forward(
            model, cfg, batch=args.batch, platforms=platforms,
            params_dtype=cfg.dtype,
        )
        stem = f"comet_{args.preset}_forward"
    out = args.output or os.path.join(args.output_dir, stem + ".jaxexport")
    manifest = serving.save_exported(exp, out, cfg=cfg, extra_manifest=extra)
    print(json.dumps({"artifact": out, **manifest}, sort_keys=True))


def cmd_match(args):
    """Matching-stack entry point (the gluefactory train/eval scripts'
    role): run a NAMED experiment (configs.py, the configs/*.yaml
    equivalent) on the synthetic homography benchmark and print one JSON
    row of matching + robust-estimation metrics."""
    from .matching.benchmarks import (
        make_synthetic_pairs,
        run_homography_benchmark,
    )
    from .matching.configs import build_pipeline, list_experiments

    if args.list:
        for name in list_experiments():
            print(name)
        return
    size = args.image_size
    if args.train:
        if args.exp_dir:
            # tee training output to <exp-dir>/log.txt like gluefactory
            # (train.py:627 `with capture_outputs(output_dir / "log.txt")`)
            from .matching.capture import capture_outputs

            with capture_outputs(os.path.join(args.exp_dir, "log.txt")):
                _match_train(args)
        else:
            _match_train(args)
        return
    if args.pipeline:
        _match_pipeline(args)
        return
    if args.export_features:
        _match_export(args)
        return
    pipeline = build_pipeline(args.experiment, image_hw=(size, size))
    if args.load_experiment:
        from .matching.experiments import load_experiment_into_pipeline

        meta = load_experiment_into_pipeline(pipeline, args.load_experiment)
        print(f"loaded checkpoint (step {meta.get('step')}, "
              f"loss {meta.get('loss')})")
    pairs = make_synthetic_pairs(
        args.n_pairs, hw=(size, size), seed=args.seed
    )
    row = run_homography_benchmark(pipeline, pairs)
    print(json.dumps(_finite_json({"experiment": args.experiment, **row})))


def _match_pipeline(args):
    """Run a cached-prediction eval pipeline (the gluefactory
    `python -m gluefactory.eval.{hpatches,megadepth1500}` entry points):
    export predictions to <exp-dir>/predictions.h5 (reused on rerun),
    compute summaries, print them as one JSON row."""
    from .matching.eval_pipeline import (
        HomographyEvalPipeline,
        RelativePoseEvalPipeline,
    )

    cls = {
        "hpatches": HomographyEvalPipeline,
        "relpose": RelativePoseEvalPipeline,
    }[args.pipeline]
    conf = {"data": {"n_pairs": args.n_pairs, "seed": args.seed}}
    if args.pipeline == "hpatches":
        conf["data"]["image_size"] = args.image_size
        if args.image_dir:  # real on-disk images (VERDICT r2 item 8)
            conf["data"]["image_dir"] = args.image_dir
            conf["data"]["pairs_file"] = args.pairs_file
    elif args.pipeline == "relpose" and args.image_dir:
        conf["data"]["amd_dir"] = args.image_dir
        conf["data"]["max_pairs"] = args.n_pairs
    pipe = cls(conf)
    exp_dir = args.exp_dir or os.path.join(
        "outputs", f"match_{args.pipeline}"
    )
    summaries, _ = pipe.run(exp_dir, overwrite=args.overwrite,
                            overwrite_eval=args.overwrite)
    if args.inspect:
        paths = pipe.inspect(exp_dir, k=args.inspect)
        print(f"inspect: wrote {len(paths)} renders under "
              f"{os.path.join(exp_dir, 'inspect')}")
    print(json.dumps(_finite_json({"pipeline": args.pipeline, "exp_dir": exp_dir,
                      **{k: (round(v, 5) if isinstance(v, float) else v)
                         for k, v in summaries.items()}})))


def _match_export(args):
    """Export local features of every image under --export-features to an
    h5 cache (gluefactory/scripts/export_local_features.py equivalent).
    The cache is re-served as a model by matching.cache_loader.CacheLoader
    (cache_loader.py parity)."""
    import numpy as np
    from PIL import Image

    from .matching.configs import build_pipeline
    from .matching.eval_pipeline import export_predictions

    size = args.image_size
    pipeline = build_pipeline(args.experiment, image_hw=(size, size))
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    names = sorted(
        f for f in os.listdir(args.export_features)
        if f.lower().endswith(exts)
    )
    if not names:
        raise SystemExit(f"no images found under {args.export_features}")

    def loader():
        for name in names:
            img = Image.open(
                os.path.join(args.export_features, name)
            ).convert("L").resize((size, size), Image.BILINEAR)
            yield {
                "name": os.path.splitext(name)[0],
                "image": np.asarray(img, np.float32) / 255.0,
            }

    out = os.path.join(
        args.exp_dir or os.path.join("outputs", "match_features"),
        "features.h5",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    export_predictions(
        loader(),
        lambda data: pipeline.extractor(data["image"]),
        out,
        keys=["keypoints", "descriptors"],
        optional_keys=["keypoint_scores", "scores"],
    )
    print(json.dumps(
        {"exported": len(names), "experiment": args.experiment, "path": out}
    ))


def _match_train(args):
    """Train a named experiment's matcher on generated homography data
    (the gluefactory train.py loop's role; its datasets module is stripped
    from the reference, so pairs come from the synthetic generator)."""
    import numpy as np

    import jax
    import optax

    from .matching.configs import get_experiment
    from .matching.registry import get_model
    from .matching.train import (
        build_matcher_train_step,
        build_superglue_train_step,
        make_homography_training_batch,
    )

    conf = get_experiment(args.experiment)
    tb = conf.get("train")
    if not tb:
        raise SystemExit(
            f"experiment '{args.experiment}' has no train block "
            "(eval-only pairing); pick a *_homography/superglue experiment"
        )
    ext_conf = dict(conf["extractor"])
    ext_conf.setdefault("max_keypoints", 128)
    extractor = get_model(ext_conf.pop("name"), **ext_conf)
    mat_conf = dict(conf["matcher"])
    mat_name = mat_conf.pop("name")
    matcher = get_model(mat_name, **mat_conf)

    size = args.image_size
    rng = np.random.default_rng(tb["seed"] + args.seed)
    batch = make_homography_training_batch(
        extractor, rng, batch_size=args.batch_size or 4,
        image_hw=(size, size),
        difficulty=tb["homography"]["difficulty"],
        max_angle=tb["homography"]["max_angle"],
        th_positive=conf["ground_truth"]["th_positive"],
        th_negative=conf["ground_truth"]["th_negative"],
    )
    params = matcher.init(
        jax.random.PRNGKey(tb["seed"]), batch["kpts0"][0], batch["desc0"][0],
        batch["kpts1"][0], batch["desc1"][0],
    )
    tx = optax.adam(float(tb["lr"]))
    opt_state = tx.init(params)

    # experiment-dir checkpointing (gluefactory utils/experiments.py role)
    from .matching.experiments import load_checkpoint, save_experiment

    exp_dir = args.exp_dir or os.path.join(
        "outputs", f"match_train_{args.experiment.replace('+', '_')}"
    )
    start_step = 0
    if args.resume:
        tree, meta = load_checkpoint(
            exp_dir, template={"params": params, "opt": opt_state},
            get_last=True,
        )
        params, opt_state = tree["params"], tree["opt"]
        start_step = int(meta.get("step", 0))
        print(f"resumed {exp_dir} at step {start_step}")
    ckpt_every = args.ckpt_every or max(args.steps // 4, 1)
    best = None

    # optional held-out validation (gluefactory train.py:560-575 keeps the
    # best checkpoint by conf.train.best_key over the VAL loop, not the
    # train loss): benchmark the current weights on fresh synthetic pairs
    # and key "best" on the homography error
    val_pipeline = None
    if args.val_pairs:
        from .matching.benchmarks import (
            make_synthetic_pairs,
            run_homography_benchmark,
        )
        from .matching.configs import build_pipeline

        val_pipeline = build_pipeline(args.experiment, image_hw=(size, size))
        val_pairs = make_synthetic_pairs(
            args.val_pairs, hw=(size, size), seed=args.seed + 10_000
        )

    def val_metric(p):
        if val_pipeline is None:
            return None
        val_pipeline.matcher.holder["params"] = p
        row = run_homography_benchmark(val_pipeline, val_pairs)
        print(f"  val: H_err {row['H_error_ransac']:.3f} "
              f"prec {row['prec@3px']:.3f}")
        return float(row["H_error_ransac"])
    builder = (
        build_superglue_train_step
        if mat_name == "matcher_superglue"
        else build_matcher_train_step
    )
    step = builder(matcher, tx)
    first = last = None
    for i in range(args.steps):
        if i % max(args.steps // 8, 1) == 0:
            batch = make_homography_training_batch(
                extractor, rng, batch_size=args.batch_size or 4,
                image_hw=(size, size),
                difficulty=tb["homography"]["difficulty"],
                max_angle=tb["homography"]["max_angle"],
                th_positive=conf["ground_truth"]["th_positive"],
                th_negative=conf["ground_truth"]["th_negative"],
            )
        params, opt_state, loss = step(params, opt_state, batch)
        last = float(loss)
        if first is None:
            first = last
        if i % max(args.steps // 10, 1) == 0:
            print(f"step {i}: loss {last:.4f}")
        if (i + 1) % ckpt_every == 0 or i == args.steps - 1:
            ev = val_metric(params)
            _, best = save_experiment(
                exp_dir, start_step + i + 1, params, opt_state,
                conf={"experiment": args.experiment}, loss=last,
                eval_metric=last if ev is None else ev, best_eval=best,
            )
    print(json.dumps(_finite_json({
        "experiment": args.experiment, "steps": args.steps,
        "loss_first": round(first, 4), "loss_last": round(last, 4),
        "exp_dir": exp_dir, "best_eval": round(best, 4),
    })))


def _maybe_enable_compile_cache():
    """Opt-in persistent XLA compilation cache (COMET_COMPILE_CACHE=dir).

    Full-model compiles cost 20-40 s+ per jit signature on a TPU host
    (remote compile on the tunneled dev chip); the persistent cache makes
    every CLI invocation after the first start in seconds. Opt-in rather
    than default because the cache key covers jaxlib/XLA versions but not
    external state like a moved checkpoint layout, and because the
    experimental axon plugin's executable serialization is unverified —
    on standard TPU/CPU backends this is the stock jax feature
    (jax_compilation_cache_dir)."""
    cache_dir = os.environ.get("COMET_COMPILE_CACHE")
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    _maybe_enable_compile_cache()
    parser = argparse.ArgumentParser("comet_tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    pm = sub.add_parser("match", help="run a named matching experiment")
    pm.add_argument("--experiment", default="superpoint+nn")
    pm.add_argument("--list", action="store_true",
                    help="list experiment names and exit")
    pm.add_argument("--n-pairs", type=int, default=8)
    pm.add_argument("--image-size", type=int, default=120)
    pm.add_argument("--seed", type=int, default=0)
    pm.add_argument("--pipeline", default=None,
                    choices=["hpatches", "relpose"],
                    help="run a cached-prediction eval pipeline instead "
                    "of the direct benchmark")
    pm.add_argument("--exp-dir", default=None)
    pm.add_argument("--image-dir", default=None, metavar="DIR",
                    help="run --pipeline on REAL on-disk data: hpatches "
                    "takes a folder of images (each warped with exact GT "
                    "unless --pairs-file gives explicit pairs+H rows); "
                    "relpose takes an AMD-layout sequence root (frames + "
                    "GroundTruth poses -> GT relative poses)")
    pm.add_argument("--pairs-file", default=None, metavar="FILE",
                    help="with --image-dir: 'name0 name1 h00..h22' per "
                    "line (HPatches-style GT homography pairs)")
    pm.add_argument("--overwrite", action="store_true")
    pm.add_argument("--inspect", type=int, default=0, metavar="K",
                    help="after a --pipeline run, render the K worst "
                    "pairs from the prediction cache to "
                    "<exp-dir>/inspect/*.png (eval/inspect.py's role)")
    pm.add_argument("--train", action="store_true",
                    help="train the experiment's matcher on generated "
                    "homography pairs instead of benchmarking")
    pm.add_argument("--steps", type=int, default=100)
    pm.add_argument("--batch-size", type=int, default=None)
    pm.add_argument("--resume", action="store_true",
                    help="--train: continue from the last checkpoint in "
                    "--exp-dir (gluefactory get_last_checkpoint role)")
    pm.add_argument("--ckpt-every", type=int, default=None,
                    help="--train: checkpoint interval in steps "
                    "(default steps//4); best-by-loss copy kept as "
                    "checkpoint_best.msgpack")
    pm.add_argument("--val-pairs", type=int, default=0,
                    help="--train: validate each checkpoint on this many "
                    "held-out synthetic pairs and key the best checkpoint "
                    "on val homography error instead of train loss "
                    "(gluefactory best_key role)")
    pm.add_argument("--load-experiment", default=None, metavar="DIR|FILE",
                    help="benchmark: load a trained matcher checkpoint "
                    "(best of an experiment dir, or an explicit file) "
                    "before running (gluefactory load_experiment role)")
    pm.add_argument("--export-features", default=None, metavar="DIR",
                    help="export the experiment extractor's local features "
                    "for every image under DIR to <exp-dir>/features.h5 "
                    "(served back by matching.CacheLoader)")
    pm.set_defaults(fn=cmd_match)
    for name, fn in [("eval", cmd_eval), ("train", cmd_train), ("demo", cmd_demo), ("bench", cmd_bench), ("export", cmd_export)]:
        p = sub.add_parser(name)
        _common(p)
        if name == "export":
            p.add_argument(
                "--output", default=None,
                help="artifact path (default "
                "<output-dir>/comet_<preset>_forward.jaxexport); a JSON "
                "manifest sidecar is written next to it",
            )
            p.add_argument(
                "--batch", type=int, default=1,
                help="serving batch size baked into the artifact "
                "(B=1 is the measured per-chip throughput optimum, "
                "PROFILE.md round-5 batching table)",
            )
            p.add_argument(
                "--platforms", default=None,
                help="comma-separated lowering platforms (e.g. 'tpu' or "
                "'tpu,cpu'); default: the current backend",
            )
            p.add_argument(
                "--seq-frames", type=int, default=None,
                help="export the windowed long-sequence forward for "
                "sequences of this many frames instead of the seqlen "
                "forward (the whole sliding-window chain as one lax.scan "
                "graph)",
            )
        if name == "bench":
            p.add_argument(
                "--suite", default="infer",
                choices=["infer", "train", "data", "all"],
                help="infer: pure-tensor forward; train: jitted train step; "
                "data: eval with real data through the input pipeline",
            )
        if name == "train":
            p.add_argument("--epochs", type=int, default=None)
            p.add_argument(
                "--n-devices", type=int, default=None,
                help="data-parallel devices (default: all local devices)",
            )
            p.add_argument(
                "--global-batch", type=int, default=None,
                help="global batch size across all devices/processes "
                "(default: n_devices * process_count)",
            )
            p.add_argument(
                "--best-key", default="Auc_30",
                help="eval metric selecting ckpt/best.msgpack (the "
                "reference's best.bin; *_err/R_avg/T_avg minimize, "
                "everything else maximizes)",
            )
            p.add_argument(
                "--ckpt-interval", type=int, default=None,
                help="epochs between full-state checkpoints "
                "(default: config train.ckpt_interval)",
            )
            p.add_argument(
                "--eval-interval", type=int, default=None,
                help="epochs between eval passes "
                "(default: config train.eval_interval)",
            )
            p.add_argument(
                "--windowed", action="store_true",
                help="teacher-forced windowed training: each training "
                "sequence is --train-seq-len frames long, the model runs "
                "in sliding windows of seqlen (one in-graph lax.scan) and "
                "the pose loss covers the stitched global trajectory; "
                "chain anchors are teacher-forced from GT with a "
                "probability annealed 1.0 -> 0.2 (the reference's "
                "TeacherForcingScheduler, E2Epose2.py:40-56)",
            )
            p.add_argument(
                "--train-seq-len", type=int, default=None,
                help="windowed mode: total frames per training sequence "
                "(default 2 * seqlen)",
            )
            p.add_argument(
                "--tf-start", type=float, default=1.0,
                help="windowed mode: initial teacher-forcing ratio",
            )
            p.add_argument(
                "--tf-end", type=float, default=0.2,
                help="windowed mode: final teacher-forcing ratio",
            )
            p.add_argument(
                "--tf-epochs", type=int, default=300,
                help="windowed mode: epochs over which the ratio anneals",
            )
            p.add_argument(
                "--coordinator", default=None, metavar="HOST:PORT",
                help="multi-process DP: jax.distributed coordinator "
                "address; launch one process per host with identical "
                "flags (the reference's multi-node DDP rendezvous, "
                "gluefactory/train.py:237-241)",
            )
            p.add_argument(
                "--num-processes", type=int, default=None,
                help="multi-process DP: total process count",
            )
            p.add_argument(
                "--process-id", type=int, default=None,
                help="multi-process DP: this process's rank (0-based)",
            )
        p.set_defaults(fn=fn)
    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
