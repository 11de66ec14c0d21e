"""Numerical parity vs the REFERENCE torch implementation.

Each test instantiates the actual reference module from /root/reference
with random weights (the reference's own smoke-test pattern,
E2Epose2.py:660-825), converts the state_dict with the mapping builders in
tools/convert_torch_weights.py, and asserts the JAX module reproduces the
torch forward in float32. This validates BOTH the architecture parity and
the converter's layout transforms (conv/linear transposes, packed-qkv
splits, LayerScale, pos-embed handling).

All tests are CPU/float32 and marked slow (full parity chain takes minutes
on this 1-core host). Run: pytest -m slow tests/test_torch_parity.py
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _torch_ref

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "convert_torch_weights", os.path.join(_REPO, "tools", "convert_torch_weights.py")
)
cw = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cw)

_torch_ref.install()
torch.manual_seed(0)
torch.set_grad_enabled(False)


def _strip(mapping, prefix="x/"):
    return {k[len(prefix):]: v for k, v in mapping.items()}


def convert_module(torch_mod, flax_params, mapping):
    """Apply a converter mapping to a standalone module pair (torch prefix
    "" produces keys with a leading dot — strip it)."""
    mapping = {k: (tk.lstrip("."), tf) for k, (tk, tf) in mapping.items()}
    sd = {k: v.detach().numpy() for k, v in torch_mod.state_dict().items()}
    flat = cw.flatten_params(flax_params["params"])
    new = {}
    for path, tmpl in flat.items():
        assert path in mapping, f"no mapping for flax leaf {path}"
        tk, tf = mapping[path]
        assert tk in sd, f"torch key {tk} not in reference state_dict"
        arr = tf(sd[tk]).astype(np.float32)
        assert arr.shape == tuple(tmpl.shape), (path, arr.shape, tmpl.shape)
        new[path] = arr
    return {"params": cw.unflatten_params(new)}


def _close(a, b, atol=2e-4, rtol=2e-4):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------
# L1 blocks (modules.py)
# ---------------------------------------------------------------------------

def test_attn_block():
    from models import modules as ref

    from comet_tpu.models.blocks import AttnBlock

    t = ref.AttnBlock(hidden_size=64, num_heads=4).eval()
    x = torch.randn(2, 9, 64)
    want = t(x).numpy()

    m = AttnBlock(num_heads=4)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()))
    params = convert_module(t, params, _strip(cw._attn_block("x", "")  # noqa: SLF001
                                              , "x/"))
    # torch prefix "" produces keys like ".attn.in_proj_weight"
    got = m.apply(params, jnp.asarray(x.numpy()))
    _close(got, want)


def test_cross_attn_block():
    from models import modules as ref

    from comet_tpu.models.blocks import CrossAttnBlock

    t = ref.CrossAttnBlock(hidden_size=64, context_dim=64, num_heads=4).eval()
    x = torch.randn(2, 7, 64)
    ctx = torch.randn(2, 11, 64)
    want = t(x, ctx).numpy()

    m = CrossAttnBlock(num_heads=4)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()))
    params = convert_module(t, params, _strip(cw._cross_attn_block("x", ""), "x/"))
    got = m.apply(params, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()))
    _close(got, want)


# ---------------------------------------------------------------------------
# L2 encoders + update former (track_modules/blocks.py)
# ---------------------------------------------------------------------------

def test_basic_encoder():
    from models.track_modules import blocks as ref

    from comet_tpu.models.encoders import BasicEncoder

    t = ref.BasicEncoder(input_dim=3, output_dim=32, stride=4).eval()
    x = torch.randn(2, 3, 64, 64)
    want = t(x).numpy()  # [B, 32, 16, 16]

    m = BasicEncoder(output_dim=32, stride=4)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    params = convert_module(t, params, _strip(cw._basic_encoder("x", ""), "x/"))
    got = np.asarray(m.apply(params, xj)).transpose(0, 3, 1, 2)
    _close(got, want, atol=5e-4, rtol=5e-4)


def test_shallow_encoder():
    from models.track_modules import blocks as ref

    from comet_tpu.models.encoders import ShallowEncoder

    t = ref.ShallowEncoder(input_dim=3, output_dim=16, stride=1).eval()
    x = torch.randn(2, 3, 31, 31)
    want = t(x).numpy()

    m = ShallowEncoder(output_dim=16, stride=1)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    params = convert_module(t, params, _strip(cw._shallow_encoder("x", ""), "x/"))
    got = np.asarray(m.apply(params, xj)).transpose(0, 3, 1, 2)
    _close(got, want, atol=5e-4, rtol=5e-4)


def test_update_former():
    from models.track_modules import blocks as ref

    from comet_tpu.models.update_former import EfficientUpdateFormer

    t = ref.EfficientUpdateFormer(
        space_depth=2, time_depth=2, input_dim=24, hidden_size=32,
        num_heads=4, output_dim=10, add_space_attn=True, num_virtual_tracks=8,
    ).eval()
    x = torch.randn(2, 12, 5, 24)  # [B, N, T, D]
    want = t(x).numpy()

    m = EfficientUpdateFormer(
        space_depth=2, time_depth=2, hidden_size=32, num_heads=4,
        output_dim=10, add_space_attn=True, num_virtual_tracks=8,
    )
    xj = jnp.asarray(x.numpy())
    params = m.init(jax.random.PRNGKey(0), xj)
    params = convert_module(
        t, params, _strip(cw._update_former("x", "", time_depth=2, space_depth=2), "x/")
    )
    got = m.apply(params, xj)
    _close(got, want)


# ---------------------------------------------------------------------------
# L2 full tracker (base_track_predictor.py)
# ---------------------------------------------------------------------------

def _ref_cfg(track_conf=False, efficient_corr=False):
    ns = types.SimpleNamespace
    return ns(
        MODEL=ns(TRACK=ns(efficient_corr=efficient_corr)),
        track_conf=track_conf,
    )


def test_base_tracker():
    from models.track_modules import base_track_predictor as ref

    from comet_tpu.models.tracker import BaseTracker

    t = ref.BaseTrackerPredictor(
        stride=4, corr_levels=2, corr_radius=2, latent_dim=16,
        hidden_size=32, use_spaceatt=True, depth=2, fine=False,
        cfg=_ref_cfg(),
    ).eval()

    b, s, n, hh = 1, 3, 12, 16
    fmaps_t = torch.randn(b, s, 16, hh, hh)
    queries_t = torch.rand(b, n, 2) * 40 + 10  # image-scale coords

    coord_preds, vis, _conf = t(
        queries_t.clone(), fmaps_t, iters=2, down_ratio=2, TRACKorPOSE=False
    )
    want_coords = coord_preds[-1].numpy()  # [B, S, N, 2]
    want_vis = vis.numpy()

    m = BaseTracker(
        stride=4, corr_levels=2, corr_radius=2, latent_dim=16,
        hidden_size=32, use_space_attn=True, depth=2, fine=False,
    )
    fmaps_j = jnp.asarray(fmaps_t.numpy().transpose(0, 1, 3, 4, 2))
    queries_j = jnp.asarray(queries_t.numpy())
    params = m.init(jax.random.PRNGKey(0), queries_j, fmaps_j, iters=2, down_ratio=2)
    params = convert_module(
        t, params,
        _strip(cw._tracker("x", "", time_depth=2, space_depth=2, fine=False), "x/"),
    )
    out = m.apply(params, queries_j, fmaps_j, iters=2, down_ratio=2)
    # coords are in pixels (~50 px scale); 5e-3 px tolerance is pure f32
    # accumulation noise across iterations, far below any semantic drift
    _close(out.coord_preds[-1], want_coords, atol=5e-3, rtol=5e-3)
    _close(out.vis, want_vis, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# L3 DINOv2 backbone
# ---------------------------------------------------------------------------

def test_dino_vit():
    from comet_tpu.models.vit import DinoViT

    t = _torch_ref.build_torch_dinov2(img_size=56, depth=2)
    x = torch.randn(2, 3, 56, 56)
    want = t.forward_features(x)["x_norm_patchtokens"].numpy()

    m = DinoViT(img_size=56, depth=2)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    params = convert_module(
        t, params, _strip(cw._vit("x", "", depth=2, target_grid=4), "x/")
    )
    got = m.apply(params, xj)
    _close(got, want, atol=5e-4, rtol=5e-4)
