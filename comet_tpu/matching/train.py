"""Minimal matcher trainer: LightGlue on homography-supervised pairs.

Parity target: the glue-factory trainer loop (gluefactory/train.py:233-300,
370-620) reduced to its TPU-native core: a jitted optax train step over the
matcher's assignment NLL against GT labels from gt_generation, with the
data-parallel axis handled by jax.sharding instead of DDP (the rest of
gluefactory's trainer — TensorBoard, checkpoint rotation, benchmark hooks —
is provided by the main training stack in comet_tpu.training).
"""

from __future__ import annotations

from typing import Tuple

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


def make_homography_training_batch(
    extractor,
    rng,
    batch_size: int = 4,
    image_hw: Tuple[int, int] = (96, 96),
    difficulty: float = 0.7,
    max_angle: float = 45.0,
    photometric=None,
    th_positive: float = 3.0,
    th_negative: float = 5.0,
):
    """Build one supervised matcher-training batch the way gluefactory's
    (stripped) homographies dataset would: synthetic textured image ->
    difficulty-scaled homography warp -> photometric augmentation of both
    views -> extractor features -> GT labels from the true homography.

    ``photometric``: a PhotometricConfig (None = the "lg" preset; the
    experiment configs' ``train.homography`` block supplies
    difficulty/max_angle). Keypoints in the returned batch are normalized
    to [-1, 1] (the matcher contract); GT generation runs in pixels.
    Extractor padding slots (valid == False) are labeled IGNORE so the
    losses skip them.
    """
    import numpy as np

    from .augmentations import (
        LG_PRESET,
        photometric_augment,
        sample_homography_difficulty,
    )
    from .benchmarks import synthetic_texture, warp_image
    from .gt_generation import gt_matches_from_homography

    conf = LG_PRESET if photometric is None else photometric
    h, w = image_hw
    scale = jnp.asarray([max(w - 1.0, 1.0), max(h - 1.0, 1.0)], jnp.float32)
    rows = {k: [] for k in ("kpts0", "desc0", "kpts1", "desc1", "gt0", "gt1")}
    for _ in range(batch_size):
        img0 = jnp.asarray(synthetic_texture(rng, h, w))
        h_mat = jnp.asarray(
            sample_homography_difficulty(rng, h, w, difficulty, max_angle),
            jnp.float32,
        )
        img1 = warp_image(img0, h_mat)
        key = jax.random.PRNGKey(int(rng.integers(1 << 30)))
        k0, k1 = jax.random.split(key)
        f0 = extractor(photometric_augment(k0, img0, conf))
        f1 = extractor(photometric_augment(k1, img1, conf))
        gt = gt_matches_from_homography(
            f0["keypoints"], f1["keypoints"], h_mat,
            pos_threshold=th_positive, neg_threshold=th_negative,
        )
        v0 = f0.get("valid")
        v1 = f1.get("valid")
        gt0 = gt["matches0"]
        gt1 = gt["matches1"]
        if v0 is not None:
            gt0 = jnp.where(v0, gt0, IGNORE)
            # matches pointing AT padded slots are not real either
            gt1 = jnp.where(
                (gt1 >= 0) & ~v0[jnp.clip(gt1, 0, v0.shape[0] - 1)],
                IGNORE, gt1,
            )
        if v1 is not None:
            gt1 = jnp.where(v1, gt1, IGNORE)
            gt0 = jnp.where(
                (gt0 >= 0) & ~v1[jnp.clip(gt0, 0, v1.shape[0] - 1)],
                IGNORE, gt0,
            )
        rows["kpts0"].append(f0["keypoints"] / scale * 2.0 - 1.0)
        rows["desc0"].append(f0["descriptors"])
        rows["kpts1"].append(f1["keypoints"] / scale * 2.0 - 1.0)
        rows["desc1"].append(f1["descriptors"])
        rows["gt0"].append(gt0)
        rows["gt1"].append(gt1)
    return {k: jnp.stack(v) for k, v in rows.items()}
