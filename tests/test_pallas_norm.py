"""Pallas fused LayerNorm kernel vs the jnp reference.

The model-wide default routes LayerNorm through the XLA reference (faster
end-to-end, see ops/pallas_norm.py docstring); these tests call the kernel
path directly so it stays covered.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.ops.pallas_norm import _ln, _reference_ln


@pytest.mark.parametrize("m,c", [(256, 384), (300, 768), (7, 48)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_kernel_matches_reference(m, c, dtype):
    key = jax.random.PRNGKey(0)
    kx, ks, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (m, c), dtype) * 3 + 1
    scale = jax.random.normal(ks, (c,), jnp.float32)
    bias = jax.random.normal(kb, (c,), jnp.float32)
    out = _ln(x, scale, bias, 1e-6)
    ref = _reference_ln(x, scale, bias, 1e-6)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-5 if dtype == jnp.float32 else 3e-2,
    )


def test_ln_kernel_grad_matches_reference():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (64, 128), jnp.float32)
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))

    g1 = jax.grad(lambda x: jnp.sum(jnp.tanh(_ln(x, scale, bias, 1e-6))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.tanh(_reference_ln(x, scale, bias, 1e-6))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
