"""CNN feature encoders for the point tracker (flax.linen, NHWC).

Parity targets: BasicEncoder (comet/models/track_modules/blocks.py:27-111)
and ShallowEncoder (blocks.py:114-196). Channel-last layout; the multi-scale
pyramid resize uses align-corners bilinear expressed as matmuls (MXU).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import resize_bilinear_align_corners
from .blocks import InstanceNorm, ResidualBlock


class BasicEncoder(nn.Module):
    """RAFT-style 4-stage residual CNN -> output_dim channels at H/stride.

    Stages at 1/2, 1/4, 1/8, 1/16 of the input are bilinearly resized to
    H/stride and concatenated (blocks.py:90-111).
    """

    output_dim: int = 128
    stride: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        oh, ow = h // self.stride, w // self.stride

        x = nn.Conv(
            self.output_dim // 2, (7, 7), strides=2, padding=((3, 3), (3, 3)),
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(InstanceNorm(name="norm1")(x))

        def layer(x, dim, stride, name):
            x = ResidualBlock(dim, "instance", stride, dtype=self.dtype, name=f"{name}_0")(x)
            return ResidualBlock(dim, "instance", 1, dtype=self.dtype, name=f"{name}_1")(x)

        a = layer(x, self.output_dim // 2, 1, "layer1")
        b = layer(a, self.output_dim // 4 * 3, 2, "layer2")
        c = layer(b, self.output_dim, 2, "layer3")
        d = layer(c, self.output_dim, 2, "layer4")

        a = resize_bilinear_align_corners(a, oh, ow)
        b = resize_bilinear_align_corners(b, oh, ow)
        c = resize_bilinear_align_corners(c, oh, ow)
        d = resize_bilinear_align_corners(d, oh, ow)

        x = nn.Conv(
            self.output_dim * 2, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv2",
        )(jnp.concatenate([a, b, c, d], axis=-1))
        x = nn.relu(InstanceNorm(name="norm2")(x))
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv3")(x)
        return x


class ShallowEncoder(nn.Module):
    """3-layer CNN for 31x31 fine patches -> output_dim at H/stride
    (blocks.py:114-196).

    resize_output=False returns the features at the CNN's native resolution
    (H//2 after conv1) and skips the final align-corners upsample to
    H/stride. Callers exploiting the linearity of resize (correlation
    volumes commute with it, see ops/corr.corr_volume_pyramid_sample) use
    this to avoid materializing the upsampled feature tensor; the upsample
    has no parameters, so checkpoints are unaffected.
    """

    output_dim: int = 32
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    resize_output: bool = True

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]

        x = nn.Conv(
            self.output_dim, (3, 3), strides=2, padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(InstanceNorm(name="norm1")(x))

        tmp = ResidualBlock(
            self.output_dim, "instance", 2, dtype=self.dtype, name="layer1"
        )(x)
        x = x + resize_bilinear_align_corners(tmp, x.shape[-3], x.shape[-2])
        tmp = ResidualBlock(
            self.output_dim, "instance", 2, dtype=self.dtype, name="layer2"
        )(tmp)
        x = x + resize_bilinear_align_corners(tmp, x.shape[-3], x.shape[-2])

        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x) + x
        if not self.resize_output:
            return x
        return resize_bilinear_align_corners(x, h // self.stride, w // self.stride)
