"""Minimal matcher trainer: LightGlue on homography-supervised pairs.

Parity target: the glue-factory trainer loop (gluefactory/train.py:233-300,
370-620) reduced to its TPU-native core: a jitted optax train step over the
matcher's assignment NLL against GT labels from gt_generation, with the
data-parallel axis handled by jax.sharding instead of DDP (the rest of
gluefactory's trainer — TensorBoard, checkpoint rotation, benchmark hooks —
is provided by the main training stack in comet_tpu.training).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .gt_generation import IGNORE, UNMATCHED


def matcher_nll_loss(
    scores: jax.Array,  # [N0, N1] assignment probabilities (dual-softmax)
    matchability0: jax.Array,  # [N0]
    matchability1: jax.Array,  # [N1]
    gt0: jax.Array,  # [N0] GT index / UNMATCHED / IGNORE
    gt1: jax.Array,  # [N1]
) -> jax.Array:
    """Negative log-likelihood of the GT assignment (lightglue.py loss):
    matched pairs maximize their assignment score; unmatched points
    minimize their matchability; IGNORE points contribute nothing."""
    eps = 1e-8
    pos0 = gt0 >= 0
    idx = jnp.clip(gt0, 0, scores.shape[1] - 1)
    p_match = jnp.take_along_axis(scores, idx[:, None], axis=1)[:, 0]
    nll_pos = -jnp.log(p_match + eps) * pos0
    n_pos = jnp.maximum(pos0.sum(), 1)

    un0 = gt0 == UNMATCHED
    un1 = gt1 == UNMATCHED
    nll_un0 = -jnp.log(1.0 - matchability0 + eps) * un0
    nll_un1 = -jnp.log(1.0 - matchability1 + eps) * un1
    n_un = jnp.maximum(un0.sum() + un1.sum(), 1)

    return nll_pos.sum() / n_pos + (nll_un0.sum() + nll_un1.sum()) / n_un


def build_matcher_train_step(matcher, tx: optax.GradientTransformation):
    """Jitted (params, opt_state, batch) -> (params, opt_state, loss).

    batch: dict with kpts0/desc0/kpts1/desc1/gt0/gt1 (leading batch axis,
    vmapped inside)."""

    def loss_fn(params, batch):
        def one(kpts0, desc0, kpts1, desc1, gt0, gt1):
            out = matcher.apply(params, kpts0, desc0, kpts1, desc1)
            # recompute soft assignment for the loss (matcher returns the
            # hard matches; the score matrix comes from its internals)
            return matcher_nll_loss(
                out["assignment"], out["matchability0"], out["matchability1"],
                gt0, gt1,
            )

        losses = jax.vmap(one)(
            batch["kpts0"], batch["desc0"], batch["kpts1"], batch["desc1"],
            batch["gt0"], batch["gt1"],
        )
        return losses.mean()

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def build_superglue_train_step(matcher, tx: optax.GradientTransformation):
    """Jitted train step for optimal-transport matchers (SuperGlue):
    same batch contract as build_matcher_train_step, but the loss is the
    NLL of the GT partial assignment under the dustbin-augmented transport
    matrix (matcher output key "log_assignment")."""
    from .superglue import superglue_nll_loss

    def loss_fn(params, batch):
        def one(kpts0, desc0, kpts1, desc1, gt0, gt1):
            out = matcher.apply(params, kpts0, desc0, kpts1, desc1)
            return superglue_nll_loss(out["log_assignment"], gt0, gt1)

        losses = jax.vmap(one)(
            batch["kpts0"], batch["desc0"], batch["kpts1"], batch["desc1"],
            batch["gt0"], batch["gt1"],
        )
        return losses.mean()

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
