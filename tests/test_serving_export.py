"""AOT serving artifact (utils/serving.py): export -> serialize ->
deserialize -> call round-trip of the flagship forward.

The reference deploys by re-importing the full torch model class and
torch.load-ing best.bin (`/root/reference/comet/models/test_e2epose2.py:
46-94`); the TPU-native artifact is the compiled graph itself. These
tests pin the three properties a serving fleet relies on:

1. serialize/deserialize is LOSSLESS: the deserialized call and the
   in-memory Exported's call produce bit-identical outputs (same
   StableHLO, same compilation);
2. the artifact agrees with the live model.apply — exactly for the
   single-dispatch heads, and within the measured chaos-amplification
   envelope for the iterated random-weight tracker (the recompiled
   graph's fusion order differs at f32 round-off, which the ~60x/iter
   tracker map amplifies; see tests/test_torch_parity_full.py);
3. a checkpoint written by the repo's msgpack saver restores into the
   artifact's input tree WITHOUT the model class (params_from_msgpack).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module fixture exports + compiles twice

sys.path.insert(0, os.path.dirname(__file__))
from test_models import tiny_config  # noqa: E402

from comet_tpu.models import COMET  # noqa: E402
from comet_tpu.utils import serving  # noqa: E402
from comet_tpu.utils.serialization import save_params_msgpack  # noqa: E402


@pytest.fixture(scope="module")
def exported_bundle(tmp_path_factory):
    cfg = tiny_config()
    model = COMET(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(1, cfg.seqlen, cfg.img_size, cfg.img_size, 3)).astype(
            np.float32
        )
    )
    queries = jnp.asarray(
        (rng.random((1, cfg.track_num, 2)) * (cfg.img_size - 20) + 10).astype(
            np.float32
        )
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, queries)

    exp = serving.export_forward(model, cfg, batch=1, platforms=["cpu"])
    path = str(tmp_path_factory.mktemp("serving") / "comet_forward.jaxexport")
    manifest = serving.save_exported(exp, path, cfg=cfg)
    return dict(
        cfg=cfg, model=model, params=params, images=images, queries=queries,
        exp=exp, path=path, manifest=manifest,
    )


class TestServingExport:
    def test_roundtrip_bit_exact(self, exported_bundle):
        b = exported_bundle
        exp2 = serving.load_exported(b["path"])
        out_mem = b["exp"].call(b["params"], b["images"], b["queries"])
        out_disk = serving.serving_call(exp2)(
            b["params"], b["images"], b["queries"]
        )
        assert set(out_mem) == set(out_disk)
        for k in out_mem:
            np.testing.assert_array_equal(
                np.asarray(out_mem[k]), np.asarray(out_disk[k]),
                err_msg=f"serialize/deserialize changed output {k}",
            )

    def test_matches_live_model(self, exported_bundle):
        b = exported_bundle
        exp2 = serving.load_exported(b["path"])
        out_live = b["model"].apply(b["params"], b["images"], b["queries"])
        out_art = exp2.call(b["params"], b["images"], b["queries"])
        # single-dispatch heads: f32-round-off-level agreement
        np.testing.assert_allclose(
            np.asarray(out_live["pred_pose_enc"]),
            np.asarray(out_art["pred_pose_enc"]),
            atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_live["track_score"]),
            np.asarray(out_art["track_score"]),
            atol=5e-5,
        )
        # iterated tracker on random weights: fusion-order f32 noise is
        # amplified ~60x/iteration (measured, test_torch_parity_full);
        # tiny_config runs 2+2 iterations -> budget eps*60^4 ~ 1e-2 px.
        np.testing.assert_allclose(
            np.asarray(out_live["pred_track"]),
            np.asarray(out_art["pred_track"]),
            atol=5e-2,
        )

    def test_manifest(self, exported_bundle):
        b = exported_bundle
        import json

        with open(b["path"] + ".json") as f:
            m = json.load(f)
        assert m["format"] == "jax.export/stablehlo"
        assert m["platforms"] == ["cpu"]
        assert m["jax_version"] == jax.__version__
        assert m["model"]["seqlen"] == b["cfg"].seqlen
        assert m["model"]["img_size"] == b["cfg"].img_size
        assert m["artifact_bytes"] == os.path.getsize(b["path"])
        assert m["n_inputs"] == len(b["exp"].in_avals)

    def test_params_from_msgpack(self, exported_bundle, tmp_path):
        b = exported_bundle
        ckpt = str(tmp_path / "weights.msgpack")
        save_params_msgpack(ckpt, b["params"])
        exp2 = serving.load_exported(b["path"])
        restored = serving.params_from_msgpack(ckpt, exp2)
        ref_flat, ref_tree = jax.tree_util.tree_flatten(b["params"])
        got_flat, got_tree = jax.tree_util.tree_flatten(restored)
        assert len(ref_flat) == len(got_flat)
        for r, g in zip(ref_flat, got_flat):
            assert r.shape == g.shape and r.dtype == g.dtype
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
        # and the restored tree actually drives the artifact
        out = exp2.call(restored, b["images"], b["queries"])
        assert np.isfinite(np.asarray(out["pred_pose_enc"])).all()

    def test_windowed_export(self, exported_bundle, tmp_path):
        """The long-sequence windowed-scan graph exports, round-trips,
        and executes: T=2*seqlen-1 frames through one lax.scan artifact
        (serialization losslessness itself is pinned by
        test_roundtrip_bit_exact; here one execution suffices)."""
        b = exported_bundle
        cfg = b["cfg"]
        t_total = 2 * cfg.seqlen - 1
        exp = serving.export_windowed(
            b["model"], cfg, total_frames=t_total, platforms=["cpu"]
        )
        path = str(tmp_path / "windowed.jaxexport")
        manifest = serving.save_exported(
            exp, path, cfg=cfg, extra_manifest={"total_frames": t_total}
        )
        assert manifest["total_frames"] == t_total
        exp2 = serving.load_exported(path)
        rng = np.random.default_rng(1)
        images = jnp.asarray(
            rng.normal(
                size=(1, t_total, cfg.img_size, cfg.img_size, 3)
            ).astype(np.float32)
        )
        pose_enc, tracks = exp2.call(
            b["params"], images, b["queries"], jnp.float32(0.5)
        )
        assert pose_enc.shape == (1, t_total, 7)
        assert tracks.shape == (1, t_total, cfg.track_num, 2)
        assert np.isfinite(np.asarray(pose_enc)).all()
        # frame 0 is the identity anchor of the chain
        np.testing.assert_allclose(
            np.asarray(pose_enc[0, 0]),
            np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32),
            atol=1e-6,
        )

    def test_shape_mismatch_rejected(self, exported_bundle, tmp_path):
        b = exported_bundle
        bad = jax.tree_util.tree_map(lambda x: x, b["params"])
        flat, tree = jax.tree_util.tree_flatten(bad)
        flat[0] = jnp.zeros((3, 3), flat[0].dtype)
        bad = jax.tree_util.tree_unflatten(tree, flat)
        ckpt = str(tmp_path / "bad.msgpack")
        save_params_msgpack(ckpt, bad)
        exp2 = serving.load_exported(b["path"])
        with pytest.raises(ValueError):
            serving.params_from_msgpack(ckpt, exp2)
