"""Worker process for the multi-process data-parallel proof.

Launched by tests/test_multiprocess.py as N OS processes. Each process
joins a JAX distributed cluster over localhost (CPU backend), builds the
tiny COMET training setup, strides the shared fixture dataset with
``process_local_order``, and runs ``fit_epoch`` over a GLOBAL (data,) mesh
— the jax-native equivalent of the reference's multi-node DDP
(gluefactory/train.py:237-241,682-688; Accelerate in
comet/models/train_e2epose2.py:47,83). Process 0 writes the final params
to an npz; the test asserts they equal a single-process run with the same
global batch schedule.

argv: process_id num_processes port fixture_root out_npz [epochs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = int(sys.argv[3])
    fixture_root = sys.argv[4]
    out_npz = sys.argv[5]
    epochs = int(sys.argv[6]) if len(sys.argv) > 6 else 2

    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = len(jax.devices())

    from test_models import tiny_config

    from comet_tpu.data import AMDDataset, seed_query_points
    from comet_tpu.models import COMET
    from comet_tpu.parallel.mesh import make_mesh
    from comet_tpu.training import build_optimizer, build_train_step
    from comet_tpu.training.data_parallel import (
        fit_epoch,
        process_local_order,
        replicate_train_state,
    )

    cfg = tiny_config()
    model = COMET(cfg)
    ds = AMDDataset(
        os.path.join(fixture_root, "AMD_train"), crop_size=cfg.img_size,
        seq_len=cfg.seqlen, use_augs=False,
    )

    # identical params in every topology: same seed, same init shapes
    import jax.numpy as jnp

    dummy_img = jnp.zeros(
        (1, cfg.seqlen, cfg.img_size, cfg.img_size, 3), jnp.float32
    )
    dummy_q = jnp.full((1, cfg.track_num, 2), 16.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy_img, dummy_q)

    local_batch = max(n_global // nprocs, 1)
    steps_per_epoch = max(len(ds) // (local_batch * nprocs), 1)
    tx, _ = build_optimizer(
        params, 1e-3, steps_per_epoch, cfg.train.restart_num,
        cfg.train.warmup_ratio, cfg.train.warmup_lr_init, cfg.train.clip_grad,
    )
    opt_state = tx.init(params)
    train_step = build_train_step(model, cfg, tx)

    mesh = make_mesh(n_data=n_global, n_model=1)
    params, opt_state = replicate_train_state(mesh, params, opt_state)

    def seed_fn(sample):
        # deterministic grid seeding: identical queries in every topology
        return seed_query_points(
            sample.images[0], sample.first_mask, cfg.track_num,
            cfg.min_track_num, backend="grid",
            rng=np.random.default_rng(1234),
        )

    rng = np.random.default_rng(7)
    for _ in range(epochs):
        order = process_local_order(rng, len(ds))
        params, opt_state, n_steps = fit_epoch(
            train_step, params, opt_state, ds, seed_fn, local_batch, order,
            mesh=mesh, on_metrics=None,
        )
        assert n_steps == steps_per_epoch, (n_steps, steps_per_epoch)

    if pid == 0:
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            if hasattr(leaf, "addressable_shards"):
                flat[key] = np.asarray(leaf.addressable_shards[0].data)
            else:
                flat[key] = np.asarray(leaf)
        np.savez(out_npz, **flat)
        print(f"worker {pid}: saved {len(flat)} params -> {out_npz}")
    print(f"worker {pid}: done")


if __name__ == "__main__":
    main()
