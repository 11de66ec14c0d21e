"""Stage-attribution profile of the end-to-end data benchmark loop.

Replicates bench_lib.run_eval_data_benchmark's batched-eval chunk loop
(evaluate(), training/loop.py) but times every stage on the REAL chip:
per-sequence produce (decode / transfer+preprocess / seeding), chunk
assembly (build_batch), eval-step dispatch, and the metric fetch. The
point is to explain the gap between the per-stage sums (~190 ms/seq,
PROFILE.md round-4 table) and the measured end-to-end rate.

Run: python tools/profile_data_bench.py [--n 8] [--eval-batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--eval-batch", type=int, default=4)
    ap.add_argument("--resample", default="bilinear")
    args = ap.parse_args()

    from comet_tpu import native
    from comet_tpu.config import get_config
    from comet_tpu.data.datasets import AMDDataset
    from comet_tpu.data.device_pipeline import DevicePreprocessDataset
    from comet_tpu.data.fixtures import generate_amd_fixture
    from comet_tpu.models.comet import COMET
    from comet_tpu.training.data_parallel import batch_metrics, build_batch
    from comet_tpu.training.loop import build_eval_step, seed_query_points
    from comet_tpu.utils import cast_params_for_inference

    cfg = get_config("ours")
    model = COMET(cfg)
    key = jax.random.PRNGKey(0)
    images0 = jnp.zeros((1, cfg.seqlen, cfg.img_size, cfg.img_size, 3))
    queries0 = jnp.full((1, cfg.track_num, 2), cfg.img_size / 2.0)
    params = jax.jit(model.init)(key, images0, queries0)
    params = cast_params_for_inference(params, cfg.dtype)

    tmp = tempfile.TemporaryDirectory()
    root = os.path.join(tmp.name, "AMD_eval")
    generate_amd_fixture(root, n_seqs=max(args.n, 8), n_frames=cfg.seqlen + 4)
    base = AMDDataset(root, crop_size=cfg.img_size, seq_len=cfg.seqlen,
                      use_augs=False)
    decode = "native" if native.available() else "pil"
    ds = DevicePreprocessDataset(base, resample=args.resample,
                                 keep_on_device=True, decode=decode)

    eval_step = build_eval_step(model, cfg)
    rng = np.random.default_rng(0)
    n, d = args.n, args.eval_batch

    T = {k: 0.0 for k in (
        "load_raw", "transfer_crop", "preprocess+h2d", "mask+preview",
        "seed", "build_batch", "eval_dispatch", "eval_block",
        "batch_metrics", "total")}

    def timed(key_, fn, *a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        T[key_] += time.perf_counter() - t0
        return out

    def get_sample(j):
        # inline DevicePreprocessDataset.__getitem__ with timers
        from comet_tpu.data.datasets import SequenceSample
        from comet_tpu.data.device_pipeline import (
            _host_crop_resize_u8, _host_nearest_mask, preprocess_frames)

        raw = timed("load_raw", ds._load_raw, ds.seq_names[j])
        crop_u8, shifted = timed("transfer_crop", ds._transfer_crop,
                                 raw["frames_u8"], raw["square"])

        def _pp():
            im = preprocess_frames(jnp.asarray(crop_u8),
                                   jnp.asarray(shifted), ds.crop_size,
                                   ds.resample)
            return im

        images = timed("preprocess+h2d", _pp)

        def _mp():
            fm = _host_nearest_mask(raw["mask0_u8"], raw["square"],
                                    ds.crop_size)
            f0 = _host_crop_resize_u8(raw["frames_u8"][0], raw["square"],
                                      ds.crop_size)
            return fm, f0

        first_mask, frame0_u8 = timed("mask+preview", _mp)
        return SequenceSample(
            images=images, t_xyz=raw["t_xyz"], q_wxyz=raw["q_wxyz"],
            t_uvz=raw["t_uvz"], r_matrix=raw["r_matrix"],
            ratio=raw["ratio"], seq_name=raw["seq_name"],
            image_names=raw["image_names"], first_mask=first_mask,
            frame0_u8=frame0_u8)

    def run_pass(timers=True):
        n_chunks = -(-n // d)
        for ci in range(n_chunks):
            start = ci * d
            chunk = list(range(start, min(start + d, n)))
            padded = chunk + [chunk[-1]] * (d - len(chunk))
            samples = [get_sample(j) for j in padded]
            queries = [
                timed("seed", seed_query_points, s.frame0_u8, s.first_mask,
                      cfg.track_num, cfg.min_track_num, backend="corners",
                      rng=rng)
                for s in samples
            ]
            images, q, gt_b, gt_list = timed("build_batch", build_batch,
                                             samples, queries)
            out = timed("eval_dispatch", eval_step, params, images, q, gt_b)
            timed("eval_block", jax.block_until_ready, out)
            rows = timed("batch_metrics", batch_metrics, out, gt_list,
                         seq_names=[s.seq_name for s in samples])
            del rows

    # compile pass
    run_pass()
    for k in T:
        T[k] = 0.0
    t0 = time.perf_counter()
    run_pass()
    T["total"] = time.perf_counter() - t0

    print(f"\nn={n} eval_batch={d} decode={decode} resample={args.resample}")
    acc = 0.0
    for k, v in T.items():
        if k == "total":
            continue
        acc += v
        print(f"  {k:>16}: {1000 * v / n:8.1f} ms/seq")
    print(f"  {'(sum)':>16}: {1000 * acc / n:8.1f} ms/seq")
    print(f"  {'TOTAL':>16}: {1000 * T['total'] / n:8.1f} ms/seq"
          f"  -> {n / T['total']:.2f} seq/s")
    tmp.cleanup()


if __name__ == "__main__":
    main()
