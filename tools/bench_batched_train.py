"""Batched train-step throughput probe: sequences/sec as a function of batch.

Companion to tools/bench_batched_infer.py (whose round-5 result was that
B=1 is the per-chip INFERENCE optimum). Training has a different
trade-off: the backward pass is heavier per sequence but the optimizer
update (camera-predictor AdamW over 253.6M params' masked tree) is a
FIXED per-step cost that batching amortizes — and the reference's recipe
itself uses per-GPU batch 1 only because of 24 GB VRAM, not preference
(train.yaml max_images). This probe measures whether per-chip training
throughput rises with B, using the same one-scan / RTT-subtracted
methodology as bench_lib.run_train_benchmark.

Run on a QUIET host: python tools/bench_batched_train.py [--batches 1 2 4]
OOM at a batch size is reported as a row, not a crash.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(batch: int, reps: int = 6, warmup: int = 2, seed: int = 0):
    from comet_tpu.config import get_config
    from comet_tpu.geometry.cameras import CameraSet
    from comet_tpu.models.comet import COMET
    from comet_tpu.training.loop import build_train_step
    from comet_tpu.training.optim import build_optimizer

    cfg = get_config("ours")
    model = COMET(cfg)
    s = cfg.seqlen

    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ishape = (batch, s, cfg.img_size, cfg.img_size, 3)
    qshape = (batch, cfg.track_num, 2)
    images1 = jax.random.normal(k1, (1,) + ishape[1:], jnp.float32)
    queries1 = (
        jax.random.uniform(k2, (1,) + qshape[1:]) * (cfg.img_size - 64) + 32
    ).astype(jnp.float32)
    queries = jnp.broadcast_to(queries1, qshape)
    q = jax.random.normal(k4, (batch, s, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t_uvz = jax.random.normal(k4, (batch, s, 3)).at[..., 2].set(3.0)
    gt = CameraSet(
        q=q.astype(jnp.float32),
        t_xyz=jax.random.normal(k4, (batch, s, 3), jnp.float32),
        t_uvz=t_uvz.astype(jnp.float32),
        focal=jnp.full((batch, s, 2), 1745.0, jnp.float32),
        pp=jnp.full((batch, s, 2), cfg.img_size / 2.0, jnp.float32),
        ratio=jnp.full((batch,), 0.5, jnp.float32),
    )

    params = jax.jit(model.init)(k3, images1, queries1)
    tx, _ = build_optimizer(params, cfg.train.lr, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = build_train_step(model, cfg, tx)

    def run_many(params, opt_state, key, n_reps):
        def body(carry, k):
            p, o = carry
            imgs = jax.random.normal(k, ishape, jnp.float32)
            p, o, aux = step(p, o, imgs, queries, gt)
            return (p, o), aux["loss"]

        keys = jax.random.split(key, n_reps)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return losses.sum()

    fit = jax.jit(run_many, static_argnums=3)
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(3):
        float(trivial(jnp.float32(0.0)))
    rtt = (time.perf_counter() - t0) / 3

    for _ in range(warmup):
        float(fit(params, opt_state, key, reps))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fit(params, opt_state, key, reps))
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    times.sort()
    elapsed = times[1]
    seqs = reps * batch
    return {
        "batch": batch,
        "steps_per_sec": round(reps / elapsed, 3),
        "seq_per_sec": round(seqs / elapsed, 3),
        "ms_per_step": round(1000.0 * elapsed / reps, 2),
        "ms_per_seq": round(1000.0 * elapsed / seqs, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    for b in args.batches:
        try:
            r = measure(b, reps=args.reps)
        except Exception as e:  # OOM rows are data, not crashes
            r = {"batch": b, "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(r))


if __name__ == "__main__":
    main()
