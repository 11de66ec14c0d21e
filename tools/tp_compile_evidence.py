#!/usr/bin/env python
"""Full-model tensor-parallel compile evidence (VERDICT r2 item 7).

Compiles the full "ours" COMET forward under a (data=2, model=4) mesh with
``shard_params_tp`` (Megatron column/row layout, parallel/mesh.py) on a
virtual 8-device CPU mesh, records compile + run wall-time, and checks the
TP output against the replicated single-device forward on the same batch —
upgrading tensor parallelism from the 32-hidden toy proof
(tests/test_parallel.py::TestTensorParallel) to a full-model proof.

Writes one JSON row to TP_EVIDENCE.md. If GSPMD cannot partition the graph
through the Pallas custom calls within the budget, the failure (and where
it happened) is the recorded result — run under `timeout` and record rc.

Usage: python tools/tp_compile_evidence.py [--small] [--seqlen N]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    small = "--small" in sys.argv
    seqlen = None
    if "--seqlen" in sys.argv:
        seqlen = int(sys.argv[sys.argv.index("--seqlen") + 1])

    from comet_tpu.config import CameraConfig, TrackerConfig, get_config
    from comet_tpu.models import COMET
    from comet_tpu.parallel.mesh import make_mesh, shard_params_tp

    cfg = get_config("ours").replace(compute_dtype="float32")
    if seqlen:
        cfg = cfg.replace(seqlen=seqlen)
    # COMET_PARITY_ITERS="c,f": tracker iteration override. With RANDOM
    # weights the runtime iteration counts amplify any reduction-order
    # difference chaotically (measured in PARITY_FULLSCALE.md), so the
    # TP-vs-replicated correctness gate runs at 1,1; the runtime-count row
    # is recorded too for the compile/runtime numbers.
    it_env = os.environ.get("COMET_PARITY_ITERS")
    if it_env:
        import dataclasses

        ci, fi = (int(x) for x in it_env.split(","))
        cfg = cfg.replace(tracker=dataclasses.replace(
            cfg.tracker, coarse_iters=ci, fine_iters=fi
        ))
    if small:
        cfg = cfg.replace(
            seqlen=2, img_size=64, track_num=8,
            tracker=TrackerConfig(
                coarse_corr_levels=2, coarse_corr_radius=2,
                coarse_latent_dim=16, coarse_hidden_size=32, coarse_depth=2,
                coarse_iters=2, fine_corr_radius=2, fine_latent_dim=8,
                fine_hidden_size=16, fine_depth=2, fine_iters=2,
                fine_pradius=7, fine_sradius=2,
            ),
            camera=CameraConfig(
                hidden_size=32, num_heads=2, att_depth=1, trunk_depth=1,
                down_size=28, backbone_depth=2, backbone_dim=32,
                backbone_heads=2,
            ),
        )

    model = COMET(cfg)
    b = 2
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(
        size=(b, cfg.seqlen, cfg.img_size, cfg.img_size, 3)
    ).astype(np.float32))
    queries = jnp.asarray(
        (rng.random((b, cfg.track_num, 2)) * (cfg.img_size - 64) + 32)
        .astype(np.float32)
    )

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, queries)
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(params) if hasattr(x, "size")
    )
    print(f"[{time.time() - t0:7.1f}s] init: {n_params / 1e6:.1f}M params",
          flush=True)

    # replicated reference on device 0
    ref = jax.jit(model.apply)(params, images, queries)
    pose_ref = np.asarray(ref["pred_pose_enc"])
    ref_fwd_s = time.time() - t0
    print(f"[{ref_fwd_s:7.1f}s] replicated forward done", flush=True)

    mesh = make_mesh(n_data=2, n_model=4)
    tp_params = shard_params_tp(mesh, params)
    n_sharded = sum(
        1 for x in jax.tree_util.tree_leaves(tp_params)
        if hasattr(x, "sharding") and x.sharding.spec != P()
    )
    n_leaves = len(jax.tree_util.tree_leaves(tp_params))
    batch_shard = NamedSharding(mesh, P("data"))
    images_s = jax.device_put(images, batch_shard)
    queries_s = jax.device_put(queries, batch_shard)

    fwd = jax.jit(model.apply)
    t0 = time.time()
    lowered = fwd.lower(tp_params, images_s, queries_s)
    lower_s = time.time() - t0
    print(f"[{lower_s:7.1f}s] TP lowering done", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    print(f"[{compile_s:7.1f}s] TP compile done", flush=True)

    t0 = time.time()
    out = compiled(tp_params, images_s, queries_s)
    jax.block_until_ready(out)
    run_s = time.time() - t0
    pose_tp = np.asarray(out["pred_pose_enc"])
    d = float(np.max(np.abs(pose_tp - pose_ref)))
    ok = bool(d < 1e-3 and np.isfinite(pose_tp).all())

    row = {
        "date": time.strftime("%Y-%m-%d"),
        "config": ("small-smoke" if small else
                   f"full 'ours' fwd, seqlen={cfg.seqlen}, "
                   f"img={cfg.img_size}, N={cfg.track_num}, B=2"),
        "mesh": "(data=2, model=4), 8 virtual CPU devices",
        "params_M": round(n_params / 1e6, 1),
        "tp_sharded_leaves": f"{n_sharded}/{n_leaves}",
        "lower_s": round(lower_s, 1),
        "compile_s": round(compile_s, 1),
        "run_s": round(run_s, 1),
        "max_abs_pose_diff_vs_replicated": d,
        "ok": ok,
    }
    print(json.dumps(row), flush=True)
    if not small:
        path = os.path.join(_REPO, "TP_EVIDENCE.md")
        header = (
            "# Full-model tensor-parallel compile evidence\n\n"
            "Rows recorded by `tools/tp_compile_evidence.py` (VERDICT r2 "
            "item 7): the full 'ours' forward compiled and executed under "
            "a (data=2, model=4) mesh with the Megatron param layout of "
            "`parallel/mesh.py shard_params_tp`, diffed against the "
            "replicated forward.\n\n"
        )
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(header)
        with open(path, "a") as f:
            f.write("```json\n" + json.dumps(row) + "\n```\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
