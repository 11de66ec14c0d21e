"""SuperGlue-style matcher: attentional GNN + Sinkhorn optimal transport.

Parity target: the reference vendors SuperGlue at
comet/models/dependency/glue-factory/gluefactory_nonfree/superglue.py
(~342 LoC): a keypoint-position MLP encoder added to descriptors, L
alternating self/cross message-passing layers (MHA message, MLP merge on
[x, message]), a final projection, and a partial assignment solved by
log-space Sinkhorn iterations over a score matrix augmented with a learned
dustbin row/column.

TPU-native design: static shapes with validity masks (padded keypoint sets
jit cleanly), the Sinkhorn loop is a `lax.scan` (fixed iteration count, no
data-dependent control flow), and all logits/log-probabilities accumulate
in float32. Nothing is copied from the torch source — the module is an
original flax implementation of the published algorithm.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.blocks import gelu
from .registry import register_model


def log_sinkhorn(
    scores: jax.Array,  # [N0, N1] f32 similarity matrix
    bin_score: jax.Array,  # scalar, learned dustbin affinity
    iters: int,
    valid0: Optional[jax.Array] = None,  # [N0] bool
    valid1: Optional[jax.Array] = None,  # [N1] bool
) -> jax.Array:
    """Log-domain Sinkhorn over the dustbin-augmented score matrix.

    Returns log-assignment [N0+1, N1+1]. Row i < N0 sums (in probability
    space) to ~1/(n0+n1)·... following the SuperGlue marginal convention:
    each real keypoint carries one unit of mass, each dustbin carries the
    full count of the opposite side. Invalid (padded) rows/columns carry
    zero mass and cannot absorb any.
    """
    n0, n1 = scores.shape
    f32 = jnp.float32
    v0 = jnp.ones(n0, bool) if valid0 is None else valid0
    v1 = jnp.ones(n1, bool) if valid1 is None else valid1
    m = v0.sum().astype(f32)
    n = v1.sum().astype(f32)

    neg = jnp.asarray(-1e9, f32)
    # padded keypoints must not bind to anything (including dustbins):
    # zero mass below makes their rows/cols irrelevant, but keep their
    # scores finite to avoid NaN in logsumexp
    s = jnp.where(v0[:, None] & v1[None, :], scores.astype(f32), neg)
    bins0 = jnp.where(v0, bin_score.astype(f32), neg)  # [N0]
    bins1 = jnp.where(v1, bin_score.astype(f32), neg)  # [N1]
    z = jnp.block(
        [[s, bins0[:, None]], [bins1[None, :], bin_score.astype(f32)[None, None]]]
    )  # [N0+1, N1+1]

    # marginals (log-mass): real rows 1, row dustbin n; real cols 1, col
    # dustbin m; everything normalized by (m + n)
    norm = -jnp.log(m + n)
    log_mu = jnp.concatenate(
        [jnp.where(v0, norm, neg), jnp.log(n)[None] + norm]
    )  # [N0+1]
    log_nu = jnp.concatenate(
        [jnp.where(v1, norm, neg), jnp.log(m)[None] + norm]
    )  # [N1+1]

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(z + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(z + u[:, None], axis=0)
        return (u, v), None

    (u, v), _ = jax.lax.scan(
        body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)), None,
        length=iters,
    )
    return z + u[:, None] + v[None, :] - norm


class KeypointEncoder(nn.Module):
    """MLP on (x, y, score) -> feature dim, added to the visual descriptor
    (the "where + what" joint embedding)."""

    dim: int
    layers: tuple = (32, 64, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, kpts, scores):
        x = jnp.concatenate([kpts, scores[:, None]], axis=-1)
        for i, w in enumerate(self.layers):
            x = nn.Dense(w, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(x)


class MessagePass(nn.Module):
    """One attentional message-passing step: MHA message from `context`,
    merged into x by an MLP on [x, message] (residual)."""

    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, mask=None):
        d = x.shape[-1]
        h = self.num_heads
        hd = d // h
        q = nn.Dense(d, dtype=self.dtype, name="q")(x).reshape(-1, h, hd)
        k = nn.Dense(d, dtype=self.dtype, name="k")(context).reshape(-1, h, hd)
        v = nn.Dense(d, dtype=self.dtype, name="v")(context).reshape(-1, h, hd)
        logits = jnp.einsum(
            "qhd,khd->hqk", q / jnp.sqrt(hd), k,
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            logits = jnp.where(mask[None, None, :], logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        msg = jnp.einsum("hqk,khd->qhd", w, v).reshape(-1, d)
        y = nn.Dense(2 * d, dtype=self.dtype, name="merge1")(
            jnp.concatenate([x, msg], axis=-1)
        )
        y = gelu(y)
        return x + nn.Dense(d, dtype=self.dtype, name="merge2")(y)


class SuperGlueMatcher(nn.Module):
    """SuperGlue: GNN over both keypoint sets + optimal-transport assignment.

    Inputs are padded to static sizes with validity masks; returns hard
    matches plus the full log-assignment (with dustbins) for the NLL loss.
    """

    depth: int = 9
    dim: int = 256
    num_heads: int = 4
    sinkhorn_iters: int = 50
    filter_threshold: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        kpts0: jax.Array,  # [N0, 2] normalized to [-1, 1]
        desc0: jax.Array,  # [N0, D_in]
        kpts1: jax.Array,
        desc1: jax.Array,
        scores0: Optional[jax.Array] = None,  # [N0] detector scores
        scores1: Optional[jax.Array] = None,
        valid0: Optional[jax.Array] = None,
        valid1: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        n0, n1 = kpts0.shape[0], kpts1.shape[0]
        s0 = scores0 if scores0 is not None else jnp.ones(n0, kpts0.dtype)
        s1 = scores1 if scores1 is not None else jnp.ones(n1, kpts1.dtype)
        v0 = valid0 if valid0 is not None else jnp.ones(n0, bool)
        v1 = valid1 if valid1 is not None else jnp.ones(n1, bool)

        kenc = KeypointEncoder(self.dim, dtype=self.dtype, name="kenc")
        x0 = nn.Dense(self.dim, dtype=self.dtype, name="input_proj")(desc0)
        x1 = nn.Dense(self.dim, dtype=self.dtype, name="input_proj_1")(desc1)
        x0 = x0 + kenc(kpts0, s0)
        x1 = x1 + kenc(kpts1, s1)

        for i in range(self.depth):
            # self on both sets, then cross in both directions (the
            # reference alternates; doing both per layer with depth L
            # matches its 2L alternating schedule)
            x0 = MessagePass(self.num_heads, dtype=self.dtype, name=f"self0_{i}")(
                x0, x0, mask=v0
            )
            x1 = MessagePass(self.num_heads, dtype=self.dtype, name=f"self1_{i}")(
                x1, x1, mask=v1
            )
            x0n = MessagePass(self.num_heads, dtype=self.dtype, name=f"cross0_{i}")(
                x0, x1, mask=v1
            )
            x1 = MessagePass(self.num_heads, dtype=self.dtype, name=f"cross1_{i}")(
                x1, x0, mask=v0
            )
            x0 = x0n

        f0 = nn.Dense(self.dim, dtype=self.dtype, name="final_proj")(x0)
        f1 = nn.Dense(self.dim, dtype=self.dtype, name="final_proj_1")(x1)
        sim = jnp.einsum(
            "nd,md->nm", f0, f1, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(self.dim, jnp.float32))

        bin_score = self.param(
            "bin_score", nn.initializers.constant(1.0), ()
        )
        log_p = log_sinkhorn(sim, bin_score, self.sinkhorn_iters, v0, v1)

        # log_sinkhorn already adds log(m + n) back ("- norm"), so a fully
        # confident match has p ~= 1 here
        p = jnp.exp(log_p[:n0, :n1])
        nn01 = jnp.argmax(p, axis=1)
        nn10 = jnp.argmax(p, axis=0)
        best = jnp.take_along_axis(p, nn01[:, None], axis=1)[:, 0]
        mutual = jnp.arange(n0) == nn10[nn01]
        ok = mutual & (best > self.filter_threshold) & v0
        return {
            "matches0": jnp.where(ok, nn01, -1),
            "scores0": jnp.where(ok, best, 0.0),
            "assignment": p,
            "log_assignment": log_p,
        }


def superglue_nll_loss(
    log_assignment: jax.Array,  # [N0+1, N1+1] from the matcher
    gt0: jax.Array,  # [N0] GT match index into set 1, or -1 (unmatched)
    gt1: jax.Array,  # [N1] GT match index into set 0, or -1
    valid0: Optional[jax.Array] = None,
    valid1: Optional[jax.Array] = None,
) -> jax.Array:
    """SuperGlue training loss: NLL of the GT partial assignment —
    matched pairs hit their cell, unmatched points hit their dustbin."""
    n0 = gt0.shape[0]
    n1 = gt1.shape[0]
    v0 = jnp.ones(n0, bool) if valid0 is None else valid0
    v1 = jnp.ones(n1, bool) if valid1 is None else valid1

    col = jnp.where(gt0 >= 0, gt0, n1)  # unmatched -> dustbin column
    ll0 = jnp.take_along_axis(log_assignment[:n0], col[:, None], axis=1)[:, 0]
    row = jnp.where(gt1 >= 0, gt1, n0)  # unmatched -> dustbin row
    ll1 = jnp.take_along_axis(
        log_assignment[:, :n1], row[None, :], axis=0
    )[0, :]
    # matched pairs appear in both gathers; count them once (standard
    # practice: rows cover matches + row-dustbins, columns only dustbins)
    ll1 = jnp.where(gt1 >= 0, 0.0, ll1)
    num = v0.sum() + (v1 & (gt1 < 0)).sum()
    total = jnp.where(v0, ll0, 0.0).sum() + jnp.where(v1, ll1, 0.0).sum()
    return -total / jnp.maximum(num.astype(jnp.float32), 1.0)


register_model(
    "matcher_superglue",
    {
        "depth": 9,
        "dim": 256,
        "num_heads": 4,
        "sinkhorn_iters": 50,
        "filter_threshold": 0.2,
    },
)(SuperGlueMatcher)
