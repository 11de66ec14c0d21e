"""Device meshes and sharding helpers (the TPU-native distributed layer).

Replaces the reference's HF-Accelerate/NCCL DDP (SURVEY.md §2.3) with
jax.sharding: a (data, model) mesh, NamedSharding annotations on batch and
parameter pytrees, and XLA-inserted collectives over ICI/DCN. No explicit
communication code is needed — gradients sync through psum inserted by the
partitioner.

Axes:
- "data": batch sharding (the reference's only strategy, DDP).
- "model": optional tensor-parallel axis for the ViT/transformer weights —
  COMET is 253.6M params so this is headroom, not a requirement.
- the N=512 track axis is the natural sequence-parallel analog; shard_map
  helpers below split tracks across chips for the tracker branch.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_local_put(x: Any, sharding: NamedSharding) -> Any:
    """``device_put`` that also works when the sharding spans devices of
    OTHER processes (multi-process DP over DCN). Single-process shardings
    take the fast path; multi-process ones build the global array from the
    value every process holds (callback serves any requested index, so it
    covers both replicated specs and host-batch shards)."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    xnp = np.asarray(x)
    return jax.make_array_from_callback(
        xnp.shape, sharding, lambda idx: xnp[idx]
    )


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree with the leading axis sharded over data.

    Multi-process meshes: each process passes its LOCAL batch (its
    ``process_local_order`` slice); the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the global batch is the
    concatenation over processes, exactly the DistributedSampler
    semantics of the reference (gluefactory/train.py:434-481)."""
    sharding = data_sharding(mesh)
    if sharding.is_fully_addressable:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def replicate_params(mesh: Mesh, params: Any) -> Any:
    """Fully replicate parameters (data-parallel training)."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: host_local_put(x, sharding), params
    )


def track_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the track axis (dim 1 of queries [B, N, 2]) across data chips —
    the sequence-parallel analog for single-sequence inference."""
    return NamedSharding(mesh, P(None, "data"))


def cross_replica_mean(tree: Any, axis_name: str = "data") -> Any:
    """psum-mean a pytree inside shard_map/pmap contexts."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis_name), tree
    )


# ---------------------------------------------------------------------------
# Tensor parallelism: param-tree sharding rules over the "model" axis.
#
# The idiomatic JAX recipe (scaling-book style): annotate the parameter
# pytree with PartitionSpecs and let GSPMD insert the collectives. Feed-
# forward weight pairs use the Megatron layout — fc1/qkv column-sharded
# (output features split), fc2/out_proj row-sharded (input features split) —
# so the activation between them stays sharded and only ONE psum per block
# rides the ICI. Everything not matched stays replicated. Pallas custom
# calls have no partitioning rules, so GSPMD all-gathers their operands;
# correctness is unaffected (validated by the parity-vs-replicated test).
# ---------------------------------------------------------------------------

# Path SEGMENTS naming the big transformer matmul weights. Column-parallel:
# split the OUTPUT features; row-parallel: split INPUT. Exact segment match
# (not substring) so e.g. a "seq" module can never alias the "q" projection.
_COL_PARALLEL = frozenset({"fc1", "in_proj_kernel", "qkv", "q", "k", "v"})
_ROW_PARALLEL = frozenset({"fc2", "out_proj", "merge2"})


def tensor_parallel_spec(path: str, ndim: int) -> P:
    """PartitionSpec for one param, by tree-path segment match."""
    if ndim < 2:
        return P()  # biases/norms replicated
    segs = set(path.split("/"))
    if segs & _ROW_PARALLEL:
        return P(*([None] * (ndim - 2) + ["model", None]))
    if segs & _COL_PARALLEL:
        return P(*([None] * (ndim - 1) + ["model"]))
    return P()


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """Place a parameter pytree with tensor-parallel shardings over the
    mesh's "model" axis (data-parallel-replicated over "data").

    Weights whose sharded dimension does not divide by the model-axis size
    stay replicated (GSPMD would pad; replication is cheaper at these
    sizes and keeps the rule total)."""
    n_model = mesh.shape["model"]

    def place(path, x):
        if not hasattr(x, "shape"):
            return x
        pstr = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = tensor_parallel_spec(pstr, x.ndim)
        for dim, name in enumerate(spec):
            if name == "model" and x.shape[dim] % n_model != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
