"""Parity tests: Pallas kernels vs the reference-verified XLA ops
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comet_tpu.ops import build_fmap_pyramid, corr_pyramid_sample, extract_patches
from comet_tpu.ops.pallas_corr import (
    corr_pyramid_sample_pallas,
    extract_patches_pallas,
    pad_pyramid,
)


class TestPallasCorr:
    @pytest.mark.parametrize("radius,levels", [(2, 3), (3, 2)])
    def test_matches_xla_interior(self, rng, radius, levels):
        b, s, n, c, h = 1, 2, 6, 8, 32
        fmaps = rng.normal(size=(b, s, h, h, c)).astype(np.float32)
        # interior coords (away from borders)
        coords = (rng.random((b, s, n, 2)) * 12 + 10).astype(np.float32)
        tfeat = rng.normal(size=(b, s, n, c)).astype(np.float32)

        pyr = build_fmap_pyramid(jnp.asarray(fmaps), levels)
        ref = np.asarray(
            corr_pyramid_sample(pyr, jnp.asarray(coords), jnp.asarray(tfeat), radius)
        )
        padded = pad_pyramid(pyr, radius)
        ours = np.asarray(
            corr_pyramid_sample_pallas(
                padded, jnp.asarray(coords), jnp.asarray(tfeat), radius,
                interpret=True,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_matches_xla_borders(self, rng):
        """Coords outside / at the borders must match grid_sample border
        semantics (which corr_pyramid_sample reproduces)."""
        b, s, n, c, h, radius = 1, 1, 8, 4, 16, 2
        fmaps = rng.normal(size=(b, s, h, h, c)).astype(np.float32)
        coords = np.array(
            [[[[-5.0, -3.2], [0.1, 0.9], [15.5, 15.9], [20.0, 7.0],
               [-0.4, 8.0], [8.0, -0.6], [8.0, 16.2], [3.3, 3.7]]]],
            np.float32,
        )
        tfeat = rng.normal(size=(b, s, n, c)).astype(np.float32)
        pyr = build_fmap_pyramid(jnp.asarray(fmaps), 2)
        ref = np.asarray(
            corr_pyramid_sample(pyr, jnp.asarray(coords), jnp.asarray(tfeat), radius)
        )
        ours = np.asarray(
            corr_pyramid_sample_pallas(
                pad_pyramid(pyr, radius), jnp.asarray(coords),
                jnp.asarray(tfeat), radius, interpret=True,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestPallasPatches:
    def test_matches_xla(self, rng):
        b, h, w, c, n, p = 2, 24, 24, 3, 5, 7
        imgs = rng.normal(size=(b, h, w, c)).astype(np.float32)
        tl = rng.integers(0, h - p, size=(b, n, 2)).astype(np.int32)
        ref = np.asarray(extract_patches(jnp.asarray(imgs), jnp.asarray(tl), p))
        ours = np.asarray(
            extract_patches_pallas(jnp.asarray(imgs), jnp.asarray(tl), p, interpret=True)
        )
        np.testing.assert_array_equal(ours, ref)
