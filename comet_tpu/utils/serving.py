"""AOT serving export: the compiled COMET forward as a portable artifact.

The reference's deployment story is "ship best.bin, re-import the full
torch model class, torch.load, forward" (`/root/reference/comet/models/
test_e2epose2.py:46-94`, `abl_ours.py:24-92`): the serving process must
carry the whole training codebase. The TPU-native equivalent serializes
the *jitted graph itself* via `jax.export` (StableHLO): a serving process
deserializes the artifact and calls it — no flax module tree, no config
system, no model Python on the serving side.

Design decisions:

- **Weights stay a runtime input.** The exported function signature is
  `(params, images, queries) -> {pred_pose_enc, pred_track, ...}`, so ONE
  artifact serves every checkpoint of its configuration (the reference's
  five `abl_*.bin` files share code the same way) and the artifact stays
  small (~0.4 MB StableHLO for the full model vs 253.6M params).
  `params_from_msgpack` restores a checkpoint into the exported input
  tree without the model class.
- **Per-platform artifacts.** Export lowers for the platform(s) you name
  (default: the current backend). TPU lowering embeds the Pallas/Mosaic
  kernels as `tpu_custom_call`s, which jax.export does not guarantee
  stable across libtpu versions — we opt in with a DisabledSafetyCheck
  and record the jax version in the manifest so a serving fleet can pin
  compatibility. CPU lowering (interpret-mode kernels) has no custom
  calls and round-trips under the default checks.
- **Manifest sidecar.** `save_exported` writes `<path>.json` with the
  config name, flagship shapes, platforms, jax version, and
  input/output tree summaries, so an operator can inspect an artifact
  without deserializing it.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = [
    "export_forward",
    "export_windowed",
    "save_exported",
    "load_exported",
    "serving_call",
    "params_from_msgpack",
]


def _forward_specs(model, cfg, batch: int = 1):
    """ShapeDtypeStructs for (params, images, queries) at the config's
    flagship shapes (images [B,S,H,W,3] ImageNet-normalized, queries
    [B,N,2] frame-0 pixels — COMET.__call__'s contract)."""
    images = jax.ShapeDtypeStruct(
        (batch, cfg.seqlen, cfg.img_size, cfg.img_size, 3), jnp.float32
    )
    queries = jax.ShapeDtypeStruct((batch, cfg.track_num, 2), jnp.float32)
    params = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jnp.zeros(images.shape, images.dtype),
        jnp.zeros(queries.shape, queries.dtype),
    )
    params = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), params
    )
    return params, images, queries


def export_forward(
    model,
    cfg,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
    params_dtype=None,
) -> jax_export.Exported:
    """Trace + lower the jitted COMET forward and return the Exported.

    `platforms`: lowering platforms (e.g. ``["tpu"]`` or ``["cpu"]``);
    None = the current default backend. When "tpu" is included, the
    Mosaic kernels lower to ``tpu_custom_call`` and we disable the
    custom-call stability check for that target (the artifact is then
    guaranteed only against the recorded jax/libtpu version — see the
    manifest).

    `params_dtype`: dtype the serving checkpoint will be cast to (the
    CLI's inference path casts masters to the compute dtype before
    serving); None keeps the init dtypes.
    """
    p_spec, i_spec, q_spec = _forward_specs(model, cfg, batch)
    if params_dtype is not None:
        p_spec = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, params_dtype)
            if jnp.issubdtype(s.dtype, jnp.floating)
            else s,
            p_spec,
        )

    def fwd(params, images, queries):
        return model.apply(params, images, queries)

    plats = list(platforms) if platforms is not None else None
    return jax_export.export(
        jax.jit(fwd),
        platforms=plats,
        disabled_checks=_disabled_checks(plats),
    )(p_spec, i_spec, q_spec)


def _disabled_checks(plats):
    """Mosaic kernels lower to `tpu_custom_call`, which jax.export does
    not guarantee stable across libtpu versions — opt in when lowering
    for TPU (the manifest records the jax version for fleet pinning)."""
    tpu_bound = (
        any(p.lower() == "tpu" for p in plats)
        if plats is not None
        else jax.default_backend() not in ("cpu",)
    )
    if tpu_bound:
        return [jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    return []


def export_windowed(
    model,
    cfg,
    total_frames: int,
    platforms: Optional[Sequence[str]] = None,
    params_dtype=None,
) -> jax_export.Exported:
    """Export the long-sequence windowed-scan forward as one artifact.

    Serves sequences of `total_frames` (> cfg.seqlen) frames: the whole
    sliding-window chain — seeded-query handoff, pose-anchor chaining —
    runs as ONE lax.scan XLA computation (models/windowed.py
    `windowed_forward_scan`, the in-graph formulation of the reference's
    `E2Epose2.forward_window`). Signature of the exported function:
    ``(params, images [1,T,H,W,3], queries [1,N,2], ratio []) ->
    (pose_enc [1,T,7], tracks [1,T,N,2])``.
    """
    from ..models.windowed import windowed_forward_scan

    p_spec, _i, q_spec = _forward_specs(model, cfg, batch=1)
    if params_dtype is not None:
        p_spec = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, params_dtype)
            if jnp.issubdtype(s.dtype, jnp.floating)
            else s,
            p_spec,
        )
    images = jax.ShapeDtypeStruct(
        (1, total_frames, cfg.img_size, cfg.img_size, 3), jnp.float32
    )
    ratio = jax.ShapeDtypeStruct((), jnp.float32)

    def fwd(params, images, queries, ratio):
        pose_enc, tracks = windowed_forward_scan(
            lambda im, q: model.apply(params, im, q),
            images, queries, window_len=cfg.seqlen, ratio=ratio,
        )
        return pose_enc, tracks

    plats = list(platforms) if platforms is not None else None
    return jax_export.export(
        jax.jit(fwd), platforms=plats, disabled_checks=_disabled_checks(plats)
    )(p_spec, images, q_spec, ratio)


def _tree_summary(tree) -> Dict[str, Any]:
    leaves = jax.tree_util.tree_leaves(tree)
    return {
        "n_arrays": len(leaves),
        "n_params": int(sum(int(jnp.size(l)) for l in leaves))
        if leaves and hasattr(leaves[0], "shape")
        else None,
    }


def save_exported(
    exported: jax_export.Exported,
    path: str,
    cfg=None,
    extra_manifest: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Serialize to `path` and write a `<path>.json` manifest sidecar."""
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    manifest: Dict[str, Any] = {
        "format": "jax.export/stablehlo",
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "artifact_bytes": len(blob),
        "n_inputs": len(exported.in_avals),
        "n_outputs": len(exported.out_avals),
    }
    if cfg is not None:
        manifest["model"] = {
            "seqlen": cfg.seqlen,
            "img_size": cfg.img_size,
            "track_num": cfg.track_num,
            "compute_dtype": cfg.compute_dtype,
        }
    if extra_manifest:
        manifest.update(extra_manifest)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def load_exported(path: str) -> jax_export.Exported:
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def serving_call(exported: jax_export.Exported) -> Callable:
    """The deserialized artifact as a plain callable.

    `exported.call` re-stages through XLA on first use (compiled once,
    cached thereafter) — the serving loop treats it exactly like a
    jitted function: ``out = fn(params, images, queries)``.
    """
    return exported.call


def params_from_msgpack(
    path: str, exported: jax_export.Exported
) -> Tuple[Any, ...]:
    """Restore a checkpoint into the artifact's params input tree.

    Uses only the Exported's own input treedef/avals — no model class —
    so a serving binary needs this module and the artifact, nothing else.
    """
    from flax.serialization import msgpack_restore

    in_tree = exported.in_tree
    # in_tree is the treedef of ((args...), {kwargs}); rebuild the params
    # arg's structure from placeholder leaves.
    placeholders = [object() for _ in exported.in_avals]
    args, _kwargs = jax.tree_util.tree_unflatten(in_tree, placeholders)
    params_struct = args[0]
    flat, treedef = jax.tree_util.tree_flatten(params_struct)
    # map each placeholder leaf to its aval for dtype/shape restoration
    aval_of = {id(p): a for p, a in zip(placeholders, exported.in_avals)}
    with open(path, "rb") as f:
        raw = msgpack_restore(f.read())

    # flax msgpack stores a nested dict mirroring the params pytree; flax
    # dict leaves flatten in the same sorted-key order as tree_flatten.
    raw_flat = jax.tree_util.tree_leaves(raw)
    if len(raw_flat) != len(flat):
        raise ValueError(
            f"checkpoint has {len(raw_flat)} arrays, artifact expects "
            f"{len(flat)}"
        )
    cast = []
    for leaf, ph in zip(raw_flat, flat):
        aval = aval_of[id(ph)]
        arr = jnp.asarray(leaf)
        if tuple(arr.shape) != tuple(aval.shape):
            raise ValueError(
                f"checkpoint array shape {arr.shape} != artifact "
                f"expectation {aval.shape}"
            )
        cast.append(arr.astype(aval.dtype))
    return jax.tree_util.tree_unflatten(treedef, cast)
