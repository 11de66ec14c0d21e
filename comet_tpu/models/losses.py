"""Track-supervision losses, pure jnp.

Parity target: comet/models/losses.py — sequence_loss (:186-248, per-iteration
gamma-decayed masked L1/Huber on tracks), balanced_ce_loss (:92-175,
pos/neg-balanced BCE for visibility/confidence; debug prints dropped), and
reduce_masked_mean (:15).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

EPS = 1e-6


def reduce_masked_mean(x: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    """Mean of x over elements where mask > 0 (losses.py:15-35)."""
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    prod = x * mask
    numer = jnp.sum(prod, axis=axis)
    denom = jnp.sum(mask, axis=axis) + EPS
    return numer / denom


def huber_loss(x: jax.Array, y: jax.Array, delta: float = 1.0) -> jax.Array:
    """Elementwise Huber, summed over the coordinate axis."""
    diff = x - y
    abs_diff = jnp.abs(diff)
    quad = 0.5 * diff**2
    lin = delta * (abs_diff - 0.5 * delta)
    return jnp.where(abs_diff <= delta, quad, lin).sum(axis=-1)


def sequence_loss(
    flow_preds: Sequence[jax.Array],  # per-iteration [B, S, N, 2]
    flow_gt: jax.Array,  # [B, S, N, 2]
    vis: jax.Array,  # [B, S, N] visibility
    valids: jax.Array,  # [B, S, N] validity mask
    gamma: float = 0.8,
    vis_aware: bool = False,
    use_huber: bool = False,
) -> jax.Array:
    """Gamma-decayed per-iteration masked track loss (losses.py:186-248).

    Later iterations get exponentially larger weight gamma^(n-1-i); invalid
    or NaN ground-truth entries are scrubbed out of the mean.
    """
    n_predictions = len(flow_preds)
    finite = jnp.isfinite(flow_gt).all(axis=-1)
    valids = valids.astype(jnp.float32) * finite.astype(jnp.float32)
    gt = jnp.where(finite[..., None], flow_gt, 0.0)

    total = 0.0
    for i, pred in enumerate(flow_preds):
        weight = gamma ** (n_predictions - i - 1)
        if use_huber:
            i_loss = huber_loss(pred, gt, delta=6.0)
        else:
            i_loss = jnp.abs(pred - gt).mean(axis=-1)
        if vis_aware:
            vis_w = vis.astype(jnp.float32) + 0.1  # visible points dominate
            i_loss = i_loss * vis_w
        total = total + weight * reduce_masked_mean(i_loss, valids)
    return total / n_predictions


def balanced_ce_loss(
    pred_logits: jax.Array, gt: jax.Array, valid: jax.Array
) -> jax.Array:
    """Pos/neg-balanced binary cross-entropy (losses.py:92-175).

    pred_logits: raw scores (pre-sigmoid); gt in {0, 1}; valid mask.
    """
    gt = gt.astype(jnp.float32)
    valid = valid.astype(jnp.float32)
    pos = (gt > 0.95).astype(jnp.float32) * valid
    neg = (gt < 0.05).astype(jnp.float32) * valid

    log_sig = jax.nn.log_sigmoid(pred_logits)
    log_one_minus = jax.nn.log_sigmoid(-pred_logits)
    loss_pos = -(log_sig * pos).sum() / (pos.sum() + EPS)
    loss_neg = -(log_one_minus * neg).sum() / (neg.sum() + EPS)
    return loss_pos + loss_neg
