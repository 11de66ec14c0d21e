"""DeepLSD-equivalent: field prediction, extraction from ideal fields,
field-loss training smoke.

Parity target: gluefactory/models/lines/deeplsd.py (UNet attraction fields
+ LSD extraction over the surrogate gradient image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.matching.deeplsd import (
    DeepLSDNet,
    deeplsd_field_loss,
    extract_lines_from_fields,
)
from comet_tpu.matching.registry import get_model


def _line_fields(h, w, y0, angle=0.0):
    """Analytic GT fields for one infinite line through (., y0) at `angle`
    (0 = horizontal): df = point-line distance, angle field constant."""
    ys, xs = jnp.mgrid[0:h, 0:w]
    # line direction (cos a, sin a); normal (-sin a, cos a)
    d = jnp.abs(-(xs - w / 2) * jnp.sin(angle) + (ys - y0) * jnp.cos(angle))
    ang = jnp.full((h, w), angle % jnp.pi)
    return d.astype(jnp.float32), ang.astype(jnp.float32)


class TestFields:
    def test_net_output_contracts(self):
        net = DeepLSDNet(base=8)
        gray = jax.random.uniform(jax.random.PRNGKey(0), (64, 64))
        params = net.init(jax.random.PRNGKey(1), gray)
        out = jax.jit(lambda p, g: net.apply(p, g))(params, gray)
        assert out["df"].shape == (64, 64)
        assert out["angle"].shape == (64, 64)
        assert float(out["df"].min()) >= 0.0
        a = np.asarray(out["angle"])
        assert (a >= 0).all() and (a < np.pi + 1e-6).all()

    def test_extraction_from_ideal_fields_recovers_line(self):
        h, w = 64, 64
        df, ang = _line_fields(h, w, y0=30.0, angle=0.0)
        segs = extract_lines_from_fields(df, ang, max_lines=16, min_length=6.0)
        v = np.asarray(segs.valid)
        assert v.any()
        s = np.asarray(segs.segments)[v]
        # every recovered segment must lie on the horizontal line y=30
        assert np.abs(s[..., 1] - 30.0).max() < 2.0
        # and be genuinely horizontal and long
        lengths = np.linalg.norm(s[:, 0] - s[:, 1], axis=-1)
        assert lengths.max() > 20.0

    def test_extraction_diagonal(self):
        h, w = 64, 64
        df, ang = _line_fields(h, w, y0=32.0, angle=jnp.pi / 4)
        segs = extract_lines_from_fields(df, ang, max_lines=16, min_length=6.0)
        v = np.asarray(segs.valid)
        assert v.any()
        s = np.asarray(segs.segments)[v]
        d = s[:, 1] - s[:, 0]
        slope = np.arctan2(d[:, 1], d[:, 0]) % np.pi
        assert np.abs(slope - np.pi / 4).max() < 0.2

    def test_registry(self):
        det = get_model("lines_deeplsd", base=8, max_lines=8)
        gray = jax.random.uniform(jax.random.PRNGKey(0), (48, 48))
        det.init(jax.random.PRNGKey(1), gray)
        segs = det(gray)
        assert segs.segments.shape == (8, 2, 2)
        assert segs.valid.dtype == jnp.bool_


class TestFieldLoss:
    def test_perfect_prediction_zero_loss(self):
        df, ang = _line_fields(32, 32, y0=16.0)
        vec = jnp.stack([jnp.cos(2 * ang), jnp.sin(2 * ang)], axis=-1)
        loss = deeplsd_field_loss(
            {"df": df, "angle": ang, "angle_vec": vec}, df, ang
        )
        assert float(loss) < 1e-5

    def test_training_reduces_loss(self):
        import optax

        h = w = 48
        df_gt, ang_gt = _line_fields(h, w, y0=20.0, angle=0.3)
        # input image: dark line on bright background following the GT
        gray = jnp.exp(-df_gt / 1.0)

        net = DeepLSDNet(base=8)
        params = net.init(jax.random.PRNGKey(0), gray)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                return deeplsd_field_loss(net.apply(p, gray), df_gt, ang_gt)

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        first = None
        for _ in range(60):
            params, opt, loss = step(params, opt)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.5
