"""Optimizer and LR schedule (optax).

Parity targets: build_optimizer (comet/models/train_util.py:311-333) — AdamW
over the camera-predictor parameters ONLY — and WarmupCosineRestarts
(train_util.py:2099-2128): cosine restarts with period T_0 epochs, linear
warmup for the first warmup_ratio fraction of each restart period.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_restarts(
    base_lr: float,
    period_steps: int,
    warmup_ratio: float = 0.1,
    warmup_lr_init: float = 1e-7,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """WarmupCosineRestarts (train_util.py:2099-2128) with T_mult=1."""
    warmup_steps = int(period_steps * warmup_ratio)

    def schedule(step):
        t_cur = jnp.mod(step, period_steps)
        warm = warmup_lr_init + (base_lr - warmup_lr_init) * (
            t_cur / jnp.maximum(warmup_steps, 1)
        )
        t_adj = t_cur - warmup_steps
        t_i = jnp.maximum(period_steps - warmup_steps, 1)
        cos = eta_min + (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * t_adj / t_i)
        ) / 2.0
        return jnp.where(t_cur < warmup_steps, warm, cos)

    return schedule


def camera_only_mask(params: Any) -> Any:
    """Trainable-parameter mask: only the camera predictor (minus its frozen
    ViT backbone) receives updates — mirroring the reference optimizer that
    sees model.camera_predictor.parameters() with backbone requires_grad
    False (train_util.py:313, camera_predictor10.py:121-124)."""

    def mask_fn(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        in_camera = any("camera_predictor" in str(k) for k in keys)
        in_backbone = any("backbone" in str(k) for k in keys)
        return in_camera and not in_backbone

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def trainable_labels(params: Any) -> Any:
    """'train'/'freeze' labels for optax.multi_transform."""
    return jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", camera_only_mask(params)
    )


def build_optimizer(
    params: Any,
    base_lr: float = 1e-5,
    steps_per_epoch: int = 1,
    restart_epochs: int = 80,
    warmup_ratio: float = 0.1,
    warmup_lr_init: float = 1e-7,
    clip_grad: float = 1.0,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW + warmup-cosine-restarts over camera params only."""
    schedule = warmup_cosine_restarts(
        base_lr, restart_epochs * steps_per_epoch, warmup_ratio, warmup_lr_init
    )
    inner = optax.chain(
        optax.clip_by_global_norm(clip_grad) if clip_grad > 0 else optax.identity(),
        optax.adamw(schedule),
    )
    # frozen leaves get zero updates (optax.masked would pass grads through)
    tx = optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()},
        trainable_labels(params),
    )
    return tx, schedule
