"""Registered dense backbones for the matching framework.

Parity surface: ``gluefactory/models/backbones/dinov2.py`` — a registry
model that runs a DINOv2 ViT over an image and exposes the patch-token
feature map, the cls-token global descriptor, and flattened per-patch
descriptors. The reference downloads pretrained weights from torch.hub;
here the in-repo flax DinoViT (models/vit.py, converter-mapped by
tools/convert_torch_weights.py) fills that role, weightless-capable like
the other extractors in this environment.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.vit import DinoViT
from .registry import register_model


@register_model(
    "backbone_dinov2",
    {
        "size": 224,
        "allow_resize": False,
        "embed_dim": 384,
        "depth": 12,
        "num_heads": 6,
        "num_register_tokens": 0,
        "params_path": None,
        "seed": 0,
    },
)
def make_dinov2_backbone(
    size: int = 224,
    allow_resize: bool = False,
    embed_dim: int = 384,
    depth: int = 12,
    num_heads: int = 6,
    num_register_tokens: int = 0,
    params_path: Optional[str] = None,
    seed: int = 0,
):
    """DINOv2 backbone factory (default geometry = ViT-S/14, the
    reference's default ``dinov2_vits14``; register-token and ViT-B
    geometries are a conf away).

    The returned callable takes an image [H, W, 3] or a batch
    [B, 3, H, W] (the reference's layout) and returns
    {"features" [B, C, h, w], "global_descriptor" [B, C],
    "descriptors" [B, h*w, C]} — the exact output dict of
    gluefactory/models/backbones/dinov2.py:22-28.
    """
    model = DinoViT(
        img_size=size,
        patch_size=14,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        num_register_tokens=num_register_tokens,
    )
    state: Dict[str, object] = {}

    def backbone(image: jax.Array) -> Dict[str, jax.Array]:
        if image.ndim == 3 and image.shape[-1] in (1, 3):  # [H, W, C]
            image = image[None]
        elif image.ndim == 3:  # [C, H, W]
            image = image.transpose(1, 2, 0)[None]
        elif image.ndim == 4:  # [B, C, H, W] (reference layout)
            image = image.transpose(0, 2, 3, 1)
        if image.shape[-1] == 1:
            image = jnp.broadcast_to(image, image.shape[:-1] + (3,))
        h, w = image.shape[1], image.shape[2]
        if allow_resize:
            # reference semantics (gluefactory models/backbones/dinov2.py:18):
            # shrink each dim to the nearest lower multiple of the 14-px
            # patch, preserving resolution and aspect ratio; the ViT
            # resamples its position embedding for the resulting grid
            nh, nw = max(h // 14, 1) * 14, max(w // 14, 1) * 14
            if (nh, nw) != (h, w):
                image = jax.image.resize(
                    image, (image.shape[0], nh, nw, image.shape[3]), "bilinear"
                )
        elif h != size or w != size:
            raise ValueError(
                f"backbone_dinov2 configured for {size}x{size} inputs, "
                f"got {h}x{w}; set allow_resize=True to run at the "
                "nearest lower multiple-of-14 resolution"
            )
        if "params" not in state:
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3))
            )
            if params_path:
                from ..utils import load_params_msgpack

                params = load_params_msgpack(params_path, params)
            state["params"] = params
        tokens, cls = model.apply(state["params"], image, return_cls=True)
        b, p, c = tokens.shape
        gh, gw = image.shape[1] // 14, image.shape[2] // 14
        return {
            "features": tokens.reshape(b, gh, gw, c).transpose(0, 3, 1, 2),
            "global_descriptor": cls,
            "descriptors": tokens,
        }

    return backbone
