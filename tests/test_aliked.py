"""ALIKED extractor tests (models/aliked.py).

Pretrained ALIKED weights are unreachable offline (and torchvision, which
the reference needs for deform_conv2d, is absent), so the numerics are
certified three ways instead of end-to-end torch parity:
- the JAX deformable conv against a from-scratch numpy implementation of
  torchvision's documented `deform_conv2d` semantics;
- DKD sub-pixel detection against analytically-placed Gaussian peaks;
- the converter against a synthetically-shaped torch-layout state_dict
  (transposition round-trip + full coverage of ALIKED_TORCH_MAP).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comet_tpu.models.aliked import (
    ALIKED,
    ALIKED_CFGS,
    convert_aliked_state_dict,
    deform_conv2d,
    dkd_detect,
    simple_nms,
)

pytestmark = pytest.mark.fast


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _np_deform_conv2d(x, offsets, kernel, pad):
    """torchvision.ops.deform_conv2d semantics, scalar loops, NHWC.

    x [H, W, C]; offsets [H, W, 2*K*K] with (dy, dx) per tap, row-major
    taps; kernel [K, K, C, C_out]; zero padding outside the image."""
    h, w, c = x.shape
    kh, kw, _, cout = kernel.shape
    out = np.zeros((h, w, cout), np.float64)

    def sample(y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        val = np.zeros(c, np.float64)
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xc = y0 + dy, x0 + dx
                wgt = (1 - abs(y - yy)) * (1 - abs(xx - xc))
                if 0 <= yy < h and 0 <= xc < w and wgt > 0:
                    val += wgt * x[yy, xc]
        return val

    for oy in range(h):
        for ox in range(w):
            acc = np.zeros(cout, np.float64)
            for i in range(kh):
                for j in range(kw):
                    t = i * kw + j
                    sy = oy - pad + i + offsets[oy, ox, 2 * t]
                    sx = ox - pad + j + offsets[oy, ox, 2 * t + 1]
                    acc += sample(sy, sx) @ kernel[i, j]
            out[oy, ox] = acc
    return out


class TestDeformConv:
    def test_matches_numpy_reference(self, rng):
        h, w, c, cout, k = 6, 7, 3, 4, 3
        x = rng.normal(size=(h, w, c)).astype(np.float32)
        off = (rng.normal(size=(h, w, 2 * k * k)) * 1.5).astype(np.float32)
        kern = rng.normal(size=(k, k, c, cout)).astype(np.float32)
        want = _np_deform_conv2d(
            x.astype(np.float64), off.astype(np.float64),
            kern.astype(np.float64), pad=k // 2,
        )
        got = np.asarray(
            deform_conv2d(jnp.asarray(x)[None], jnp.asarray(off)[None],
                          jnp.asarray(kern))
        )[0]
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_zero_offsets_is_plain_conv(self, rng):
        """With zero offsets the deformable conv must equal a standard
        same-padding conv (integer taps, zero padding)."""
        h, w, c, cout = 8, 8, 2, 3
        x = rng.normal(size=(1, h, w, c)).astype(np.float32)
        kern = rng.normal(size=(3, 3, c, cout)).astype(np.float32)
        got = np.asarray(
            deform_conv2d(jnp.asarray(x), jnp.zeros((1, h, w, 18)),
                          jnp.asarray(kern))
        )
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(kern), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


class TestDKD:
    def test_subpixel_peaks(self):
        """Gaussian blobs at fractional positions: top-K detection must
        find both, soft-argmax must recover the fractional offset."""
        h, w = 48, 48
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        peaks = [(13.4, 21.7), (33.8, 9.3)]  # (y, x)
        sm = np.zeros((h, w))
        for py, px in peaks:
            sm += 0.9 * np.exp(-((yy - py) ** 2 + (xx - px) ** 2) / (2 * 1.2**2))
        kpts, scores, disp = dkd_detect(
            jnp.asarray(sm, jnp.float32)[None], max_keypoints=2, nms_radius=2
        )
        got = sorted(np.asarray(kpts[0]).tolist())
        want = sorted([[px, py] for py, px in peaks])
        np.testing.assert_allclose(got, want, atol=0.15)
        assert np.all(np.asarray(scores) > 0.5)
        assert np.all(np.asarray(disp) > 0)

    def test_nms_suppresses_neighbors(self):
        sm = np.zeros((16, 16), np.float32)
        sm[8, 8] = 1.0
        sm[8, 9] = 0.9  # within radius -> suppressed
        out = np.asarray(simple_nms(jnp.asarray(sm)[None], 2))[0]
        assert out[8, 8] == 1.0 and out[8, 9] == 0.0

    def test_border_band_excluded(self):
        sm = np.zeros((16, 16), np.float32) + 0.01
        sm[0, 5] = 1.0  # on the border band
        sm[8, 8] = 0.5
        kpts, _, _ = dkd_detect(jnp.asarray(sm)[None], 1, nms_radius=2)
        np.testing.assert_allclose(np.asarray(kpts[0, 0]), [8, 8], atol=0.3)


class TestALIKEDModule:
    def test_forward_shapes_and_jit(self, rng):
        m = ALIKED(model_name="aliked-t16", max_keypoints=32)
        img = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), img)
        out = jax.jit(lambda vv, ii: m.apply(vv, ii))(v, img)
        dim = ALIKED_CFGS["aliked-t16"]["dim"]
        assert out.keypoints.shape == (1, 32, 2)
        assert out.scores.shape == (1, 32)
        assert out.descriptors.shape == (1, 32, dim)
        assert out.valid.dtype == jnp.bool_
        assert out.score_map.shape == (1, 64, 96)
        # descriptors are L2-normalized
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out.descriptors), axis=-1), 1.0,
            atol=1e-4,
        )
        # keypoints inside the image
        k = np.asarray(out.keypoints)
        assert (k[..., 0] >= 0).all() and (k[..., 0] <= 95).all()
        assert (k[..., 1] >= 0).all() and (k[..., 1] <= 63).all()

    def test_converter_roundtrip(self, rng):
        """A torch-layout state_dict with the reference's key names maps
        onto every template leaf; conv kernels arrive transposed."""
        m = ALIKED(model_name="aliked-t16", max_keypoints=16)
        img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        template = m.init(jax.random.PRNGKey(0), img)

        cfg = ALIKED_CFGS["aliked-t16"]
        c1, c2, c3, c4, dim, k, mm = (
            cfg["c1"], cfg["c2"], cfg["c3"], cfg["c4"], cfg["dim"],
            cfg["k"], cfg["m"],
        )

        def conv_w(o, i, kk=3):
            return rng.normal(size=(o, i, kk, kk)).astype(np.float32)

        sd = {}

        def add_bn(prefix, ch):
            sd[f"{prefix}.weight"] = rng.normal(size=(ch,)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.normal(size=(ch,)).astype(np.float32)
            sd[f"{prefix}.running_mean"] = np.zeros(ch, np.float32)
            sd[f"{prefix}.running_var"] = np.ones(ch, np.float32)
            sd[f"{prefix}.num_batches_tracked"] = np.asarray(0)

        # block1 (plain ConvBlock)
        sd["block1.conv1.weight"] = conv_w(c1, 3)
        sd["block1.conv2.weight"] = conv_w(c1, c1)
        add_bn("block1.bn1", c1)
        add_bn("block1.bn2", c1)
        # block2 (plain ResBlock)
        sd["block2.conv1.weight"] = conv_w(c2, c1)
        sd["block2.conv2.weight"] = conv_w(c2, c2)
        add_bn("block2.bn1", c2)
        add_bn("block2.bn2", c2)
        sd["block2.downsample.weight"] = conv_w(c2, c1, 1)
        sd["block2.downsample.bias"] = rng.normal(size=(c2,)).astype(np.float32)
        # blocks 3/4 (DCN ResBlocks)
        for name, ci, co in (("block3", c2, c3), ("block4", c3, c4)):
            for j, cin in ((1, ci), (2, co)):
                sd[f"{name}.conv{j}.offset_conv.weight"] = conv_w(18, cin)
                sd[f"{name}.conv{j}.offset_conv.bias"] = (
                    rng.normal(size=(18,)).astype(np.float32)
                )
                sd[f"{name}.conv{j}.regular_conv.weight"] = conv_w(co, cin)
            add_bn(f"{name}.bn1", co)
            add_bn(f"{name}.bn2", co)
            sd[f"{name}.downsample.weight"] = conv_w(co, ci, 1)
            sd[f"{name}.downsample.bias"] = (
                rng.normal(size=(co,)).astype(np.float32)
            )
        # aggregation 1x1s (bias-free)
        for j, ci in ((1, c1), (2, c2), (3, c3), (4, c4)):
            sd[f"conv{j}.weight"] = conv_w(dim // 4, ci, 1)
        # score head
        sd["score_head.0.weight"] = conv_w(8, dim, 1)
        sd["score_head.0.bias"] = rng.normal(size=(8,)).astype(np.float32)
        sd["score_head.2.weight"] = conv_w(4, 8)
        sd["score_head.2.bias"] = rng.normal(size=(4,)).astype(np.float32)
        sd["score_head.4.weight"] = conv_w(4, 4)
        sd["score_head.4.bias"] = rng.normal(size=(4,)).astype(np.float32)
        sd["score_head.6.weight"] = conv_w(1, 4)
        sd["score_head.6.bias"] = rng.normal(size=(1,)).astype(np.float32)
        # SDDH
        sd["desc_head.offset_conv.0.weight"] = conv_w(2 * mm, dim, k)
        sd["desc_head.offset_conv.0.bias"] = (
            rng.normal(size=(2 * mm,)).astype(np.float32)
        )
        sd["desc_head.offset_conv.2.weight"] = conv_w(2 * mm, 2 * mm, 1)
        sd["desc_head.offset_conv.2.bias"] = (
            rng.normal(size=(2 * mm,)).astype(np.float32)
        )
        sd["desc_head.sf_conv.weight"] = conv_w(dim, dim, 1)
        sd["desc_head.agg_weights"] = (
            rng.normal(size=(mm, dim, dim)).astype(np.float32)
        )

        variables, unmapped = convert_aliked_state_dict(sd, template)
        assert [u for u in unmapped if "num_batches" not in u] == []

        # transposition check: torch OIHW -> flax HWIO
        got = variables["params"]["block1"]["conv1"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(sd["block1.conv1.weight"], (2, 3, 1, 0))
        )
        # converted tree still runs
        out = m.apply(
            jax.tree_util.tree_map(jnp.asarray, variables),
            jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32),
        )
        assert np.isfinite(np.asarray(out.descriptors)).all()


class TestRegistryIntegration:
    def test_factory_and_pipeline(self, rng):
        from comet_tpu.matching.registry import TwoViewPipeline, get_model
        from comet_tpu.matching.matchers import mutual_nearest_neighbor

        extract = get_model(
            "extractor_aliked", model_name="aliked-t16", max_keypoints=48,
            detection_threshold=0.0,
        )
        img = jnp.asarray(rng.random((50, 70, 3)), jnp.float32)
        feats = extract(img)
        assert feats["keypoints"].shape == (48, 2)
        assert feats["descriptors"].shape[0] == 48

        def matcher(f0, f1):
            return mutual_nearest_neighbor(
                f0["descriptors"], f1["descriptors"]
            )

        pipe = TwoViewPipeline(extract, matcher)
        out = pipe(img, img)
        # identical images: every valid keypoint matches itself
        m0 = np.asarray(out["matches0"])
        valid = np.asarray(feats["valid"])
        self_matched = (m0 == np.arange(len(m0))) | ~valid
        assert self_matched.mean() > 0.9
