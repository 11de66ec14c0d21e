"""Photometric augmentations for matcher training (jax-native, jittable).

Parity target: the ``photometric: {name: lg}`` block of gluefactory's
experiment YAMLs (configs/*_homography.yaml). The module implementing it
(gluefactory/datasets/augmentations.py) is STRIPPED from the reference
repo — training is not runnable as shipped — so this reconstructs the
standard "lg" (LightGlue-paper) recipe: random brightness, contrast,
saturation, gamma, additive gaussian noise, and gaussian blur, each
applied with an independent probability. Everything is pure jnp on
[H, W, C] float images in [0, 1]; one PRNGKey drives the whole pipeline
so batches are reproducible.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PhotometricConfig(NamedTuple):
    p: float = 0.95  # probability each sub-op applies
    brightness: float = 0.15  # additive, in [0,1] units
    contrast: float = 0.3  # multiplicative around the mean
    saturation: float = 0.3  # toward/away from grayscale
    gamma: float = 0.3  # log-gamma range
    noise_std: float = 0.02
    blur_sigma: float = 1.2  # max gaussian-blur sigma (0 disables)


# the "lg" preset (gluefactory configs' photometric.name: lg)
LG_PRESET = PhotometricConfig()


def _maybe(key, p, img, fn):
    kc, ka = jax.random.split(key)
    return jnp.where(jax.random.uniform(kc) < p, fn(ka, img), img)


def _gaussian_kernel1d(sigma: jax.Array, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / k.sum()


def photometric_augment(
    key: jax.Array,
    image: jax.Array,  # [H, W, C] float in [0, 1]
    conf: PhotometricConfig = LG_PRESET,
) -> jax.Array:
    """Apply the photometric pipeline; output stays in [0, 1]."""
    keys = jax.random.split(key, 6)

    def brightness(k, x):
        return x + jax.random.uniform(
            k, minval=-conf.brightness, maxval=conf.brightness
        )

    def contrast(k, x):
        f = 1.0 + jax.random.uniform(
            k, minval=-conf.contrast, maxval=conf.contrast
        )
        m = x.mean()
        return (x - m) * f + m

    def saturation(k, x):
        f = 1.0 + jax.random.uniform(
            k, minval=-conf.saturation, maxval=conf.saturation
        )
        gray = x.mean(axis=-1, keepdims=True)
        return gray + (x - gray) * f

    def gamma(k, x):
        g = jnp.exp(
            jax.random.uniform(k, minval=-conf.gamma, maxval=conf.gamma)
        )
        return jnp.clip(x, 1e-6, 1.0) ** g

    def noise(k, x):
        return x + conf.noise_std * jax.random.normal(k, x.shape)

    def blur(k, x):
        # fixed taps (radius 3), random sigma — static shapes under jit
        sigma = jax.random.uniform(k, minval=0.1, maxval=conf.blur_sigma)
        kern = _gaussian_kernel1d(sigma, radius=3)
        xr = jnp.moveaxis(x, -1, 0)[:, None]  # [C, 1, H, W]
        for dn, shape in (("NCHW", (1, 1, 1, 7)), ("NCHW", (1, 1, 7, 1))):
            kern4 = kern.reshape(shape)
            xr = jax.lax.conv_general_dilated(
                xr, kern4, (1, 1), "SAME",
                dimension_numbers=(dn, "OIHW", dn),
            )
        return jnp.moveaxis(xr[:, 0], 0, -1)

    x = image.astype(jnp.float32)
    x = _maybe(keys[0], conf.p, x, brightness)
    x = _maybe(keys[1], conf.p, x, contrast)
    if image.shape[-1] == 3:
        x = _maybe(keys[2], conf.p, x, saturation)
    x = _maybe(keys[3], conf.p, x, gamma)
    x = _maybe(keys[4], conf.p, x, noise)
    if conf.blur_sigma > 0:
        x = _maybe(keys[5], conf.p, x, blur)
    return jnp.clip(x, 0.0, 1.0)


def sample_homography_difficulty(
    rng,
    h: int,
    w: int,
    difficulty: float = 0.7,
    max_angle: float = 45.0,
):
    """Difficulty-scaled random homography (the configs'
    ``homography: {difficulty, max_angle}`` knobs): difficulty in [0, 1]
    scales translation/scale/perspective jointly, max_angle (degrees)
    bounds the rotation. Returns a 3x3 numpy matrix (host-side sampling,
    like the benchmark generator it extends)."""
    from .benchmarks import random_homography

    d = float(difficulty)
    return random_homography(
        rng, h, w,
        max_rotation=float(max_angle) * 3.14159265 / 180.0 * d,
        max_scale=0.3 * d,
        max_translation=0.15 * d,
        max_perspective=6e-4 * d,
    )
