"""Multi-device (8 virtual CPU devices) data-parallel tests.

VERDICT round-1 item 2: prove the sharded training/eval path is
numerically identical to single-device execution, that parameters stay
replicated through an update, and that the collective reductions match.
conftest.py provisions JAX_PLATFORMS=cpu with 8 host devices.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from comet_tpu.parallel import (
    cross_replica_mean,
    data_sharding,
    make_mesh,
    replicate_params,
    replicated,
    shard_batch,
    track_sharding,
)

pytestmark = [
    pytest.mark.slow,  # ~6 min on the 1-core host
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices"),
]


def _tiny_model():
    from comet_tpu.config import CameraConfig, TrackerConfig, get_config
    from comet_tpu.models import COMET

    cfg = get_config("ours").replace(
        seqlen=2, img_size=32, track_num=8, compute_dtype="float32",
        tracker=TrackerConfig(
            coarse_stride=4, coarse_down_ratio=2, coarse_corr_levels=2,
            coarse_corr_radius=2, coarse_latent_dim=16, coarse_hidden_size=32,
            coarse_depth=2, coarse_iters=1, fine_corr_levels=3,
            fine_corr_radius=2, fine_latent_dim=8, fine_hidden_size=16,
            fine_depth=2, fine_iters=1, fine_pradius=7, fine_sradius=2,
        ),
        camera=CameraConfig(
            hidden_size=32, num_heads=2, att_depth=1, trunk_depth=1,
            down_size=28,
        ),
    )
    return COMET(cfg), cfg


def _batch(rng, b, cfg):
    images = rng.normal(size=(b, cfg.seqlen, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    queries = (rng.random((b, cfg.track_num, 2)) * (cfg.img_size - 16) + 8).astype(np.float32)
    return jnp.asarray(images), jnp.asarray(queries)


class TestDataParallel:
    def test_sharded_forward_matches_single_device(self, rng):
        model, cfg = _tiny_model()
        images, queries = _batch(rng, 8, cfg)
        params = model.init(jax.random.PRNGKey(0), images[:1], queries[:1])

        fwd = jax.jit(lambda p, im, q: model.apply(p, im, q)["pred_pose_enc"])
        ref = fwd(params, images, queries)  # default placement

        mesh = make_mesh(n_data=8, n_model=1)
        params_r = replicate_params(mesh, params)
        images_s = jax.device_put(images, data_sharding(mesh))
        queries_s = jax.device_put(queries, data_sharding(mesh))
        out = fwd(params_r, images_s, queries_s)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_params_stay_replicated_through_train_step(self, rng):
        # NOTE: 2-device mesh on purpose. XLA CPU's in-process collectives
        # abort the whole process (rendezvous.cc hardcoded 40 s termination
        # timeout, no flag) when all 8 simulated device threads can't reach
        # the collective in time — on this 1-core host the full fwd+bwd
        # step per shard makes that a coin flip. The replication/grad-sync
        # property is device-count-agnostic; the cheaper forward and
        # collective tests below keep the full 8-device mesh.
        from comet_tpu.geometry.cameras import CameraSet
        from comet_tpu.training.loop import build_train_step
        from comet_tpu.training.optim import build_optimizer

        model, cfg = _tiny_model()
        b = 2
        images, queries = _batch(rng, b, cfg)
        q = rng.normal(size=(b, cfg.seqlen, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        t_uvz = rng.normal(size=(b, cfg.seqlen, 3)).astype(np.float32)
        t_uvz[..., 2] = np.abs(t_uvz[..., 2]) + 2.0
        gt = CameraSet(
            q=jnp.asarray(q),
            t_xyz=jnp.asarray(rng.normal(size=(b, cfg.seqlen, 3)).astype(np.float32)),
            t_uvz=jnp.asarray(t_uvz),
            focal=jnp.ones((b, cfg.seqlen, 2), jnp.float32),
            pp=jnp.zeros((b, cfg.seqlen, 2), jnp.float32),
            ratio=jnp.full((b,), 0.5, jnp.float32),
        )

        params = model.init(jax.random.PRNGKey(0), images[:1], queries[:1])
        tx, _ = build_optimizer(params, steps_per_epoch=1)
        opt_state = tx.init(params)
        step = build_train_step(model, cfg, tx)

        mesh = make_mesh(n_data=2)
        params = replicate_params(mesh, params)
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh))
            if hasattr(x, "shape") else x,
            opt_state,
        )
        batch = shard_batch(mesh, (images, queries))
        gt_s = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sharding(mesh)), gt
        )
        new_params, _, aux = step(params, opt_state, batch[0], batch[1], gt_s)
        assert np.isfinite(float(aux["loss"]))

        # every updated parameter must remain fully replicated: identical
        # per-device shards
        leaves = jax.tree_util.tree_leaves(new_params)
        checked = 0
        for leaf in leaves[:10]:
            if not hasattr(leaf, "addressable_shards"):
                continue
            shards = leaf.addressable_shards
            if len(shards) < 2:
                continue
            first = np.asarray(shards[0].data)
            for sh in shards[1:]:
                np.testing.assert_array_equal(np.asarray(sh.data), first)
            checked += 1
        assert checked > 0

    def test_mesh_train_step_matches_single_device(self, rng):
        """VERDICT round-2 item 2: the production data-parallel path
        (replicate state -> shard batch -> jitted train step) must produce
        the same loss AND the same updated params as a single-device step
        on the identical global batch. 2-device mesh for the same
        rendezvous-timeout reason as above."""
        from comet_tpu.training.data_parallel import (
            build_batch,
            replicate_train_state,
            shard_train_inputs,
        )
        from comet_tpu.training.loop import build_train_step
        from comet_tpu.training.optim import build_optimizer
        from comet_tpu.data.datasets import SequenceSample

        model, cfg = _tiny_model()
        b = 2
        samples, queries = [], []
        for k in range(b):
            s = cfg.seqlen
            t_uvz = rng.normal(size=(s, 3)).astype(np.float32)
            t_uvz[:, 2] = np.abs(t_uvz[:, 2]) + 2.0
            q = rng.normal(size=(s, 4)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            samples.append(SequenceSample(
                images=rng.normal(
                    size=(s, cfg.img_size, cfg.img_size, 3)
                ).astype(np.float32),
                t_xyz=rng.normal(size=(s, 3)).astype(np.float32),
                q_wxyz=q,
                t_uvz=t_uvz,
                r_matrix=np.tile(np.eye(3, dtype=np.float32), (s, 1, 1)),
                ratio=0.5,
                seq_name=f"seq{k}",
                image_names=[f"{i}.png" for i in range(s)],
                first_mask=np.ones((cfg.img_size, cfg.img_size), bool),
            ))
            queries.append(
                (rng.random((cfg.track_num, 2)) * (cfg.img_size - 16) + 8)
                .astype(np.float32)
            )

        images, q_b, gt_b, gt_list = build_batch(samples, queries)
        params = model.init(jax.random.PRNGKey(0), images[:1], q_b[:1])
        tx, _ = build_optimizer(params, steps_per_epoch=1)
        opt_state = tx.init(params)
        step = build_train_step(model, cfg, tx)

        # single-device reference on the same global batch
        p_ref, _, aux_ref = step(params, opt_state, images, q_b, gt_b)

        mesh = make_mesh(n_data=2)
        p_m, o_m = replicate_train_state(mesh, params, opt_state)
        im_s, q_s, gt_s = shard_train_inputs(mesh, images, q_b, gt_b)
        p_new, _, aux = step(p_m, o_m, im_s, q_s, gt_s)

        np.testing.assert_allclose(
            float(aux["loss"]), float(aux_ref["loss"]), rtol=1e-5
        )
        flat_ref = jax.tree_util.tree_leaves(p_ref)
        flat_new = jax.tree_util.tree_leaves(p_new)
        assert len(flat_ref) == len(flat_new)
        for a, c in zip(flat_ref, flat_new):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(a), atol=1e-5, rtol=1e-5
            )

        # per-sample metric rows come out finite and per-sequence
        from comet_tpu.training.data_parallel import batch_metrics

        rows = batch_metrics(
            {k: np.asarray(v) for k, v in aux.items()}, gt_list
        )
        assert len(rows) == b
        assert all(np.isfinite(r["R_avg"]) for r in rows)

    def test_process_local_order_strides(self):
        from comet_tpu.training.data_parallel import process_local_order

        order = process_local_order(np.random.default_rng(0), 10)
        # single-process env: full permutation
        assert sorted(order.tolist()) == list(range(10))

    def test_cross_replica_mean_matches_psum(self, rng):
        mesh = make_mesh(n_data=8)
        x = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))

        from jax import shard_map

        f = shard_map(
            lambda v: cross_replica_mean(v, "data"),
            mesh=mesh,
            in_specs=P("data", None),
            out_specs=P("data", None),
        )
        out = np.asarray(f(x))
        want = np.broadcast_to(np.asarray(x).mean(0, keepdims=True), (8, 4))
        np.testing.assert_allclose(out, want, atol=1e-6)

    def test_track_axis_sharding_matches_unsharded(self, rng):
        """Sharding the N (track) axis — the sequence-parallel analog —
        must not change correlation sampling results."""
        from comet_tpu.ops import build_fmap_pyramid, corr_pyramid_sample

        mesh = make_mesh(n_data=8)
        fmaps = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 8)).astype(np.float32))
        coords = jnp.asarray((rng.random((1, 2, 16, 2)) * 14).astype(np.float32))
        tf = jnp.asarray(rng.normal(size=(1, 2, 16, 8)).astype(np.float32))

        fn = jax.jit(
            lambda f, c, t: corr_pyramid_sample(build_fmap_pyramid(f, 2), c, t, 1)
        )
        ref = np.asarray(fn(fmaps, coords, tf))

        shard_n = NamedSharding(mesh, P(None, None, "data"))
        coords_s = jax.device_put(coords, shard_n)
        tf_s = jax.device_put(tf, shard_n)
        fmaps_r = jax.device_put(fmaps, replicated(mesh))
        out = np.asarray(fn(fmaps_r, coords_s, tf_s))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_track_sharding_helper_spec(self):
        mesh = make_mesh(n_data=8)
        s = track_sharding(mesh)
        assert s.spec == P(None, "data")


class TestTensorParallel:
    """Tensor parallelism over the (data, model) mesh: Megatron-layout
    weight sharding via PartitionSpec rules + GSPMD collectives."""

    def test_spec_rules(self):
        from comet_tpu.parallel import tensor_parallel_spec

        assert tensor_parallel_spec("a/mlp/fc1/kernel", 2) == P(None, "model")
        assert tensor_parallel_spec("a/mlp/fc2/kernel", 2) == P("model", None)
        assert tensor_parallel_spec("attn/in_proj_kernel", 2) == P(None, "model")
        assert tensor_parallel_spec("attn/out_proj/kernel", 2) == P("model", None)
        assert tensor_parallel_spec("attn/in_proj_bias", 1) == P()
        assert tensor_parallel_spec("conv1/kernel", 4) == P()

    def test_tp_forward_matches_replicated(self, rng):
        from comet_tpu.parallel import shard_params_tp

        model, cfg = _tiny_model()
        images, queries = _batch(rng, 2, cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images, queries)

        mesh = make_mesh(n_data=2, n_model=4)
        fwd = jax.jit(lambda p, i, q: model.apply(p, i, q)["pred_pose_enc"])

        ref = np.asarray(fwd(params, images, queries))

        params_tp = shard_params_tp(mesh, params)
        imgs_s = jax.device_put(images, NamedSharding(mesh, P("data")))
        qs_s = jax.device_put(queries, NamedSharding(mesh, P("data")))
        out = np.asarray(fwd(params_tp, imgs_s, qs_s))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)

    def test_tp_shards_expected_weights(self):
        from comet_tpu.parallel import shard_params_tp

        model, cfg = _tiny_model()
        images = jnp.zeros((1, cfg.seqlen, cfg.img_size, cfg.img_size, 3))
        queries = jnp.full((1, cfg.track_num, 2), cfg.img_size / 2.0)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images, queries)
        mesh = make_mesh(n_data=2, n_model=4)
        params_tp = shard_params_tp(mesh, params)

        n_sharded = 0
        for path, x in jax.tree_util.tree_leaves_with_path(params_tp):
            spec = x.sharding.spec if hasattr(x.sharding, "spec") else None
            if spec and any(s == "model" for s in spec):
                n_sharded += 1
                # sharded dim must divide by the model-axis size
                dim = list(spec).index("model")
                assert x.shape[dim] % 4 == 0
        assert n_sharded >= 10  # the transformer stack's matmul weights
