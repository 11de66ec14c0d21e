"""Data-parallel training: mesh-sharded batches through the jitted step.

This is the production wiring of the distributed layer (parallel/mesh.py)
into training — the TPU-native replacement for the reference's
HF-Accelerate/NCCL DDP (comet/models/train_e2epose2.py:47,83;
gluefactory/train.py:233-300). Design:

- one (data,) mesh over the local devices; parameters and optimizer state
  fully replicated, batches sharded on the leading axis
  (``jax.sharding.NamedSharding`` — XLA inserts the gradient psum, no
  explicit collectives);
- per-process dataset sharding by index stride (the DistributedSampler
  equivalent): process p sees ``order[p::process_count]``;
- static batch shapes: per-epoch sample order is chunked into full
  batches, the remainder dropped (drop_last), so the step compiles once;
- asynchronous metric fetch: step N's host-side metric block runs while
  step N+1 computes on device (the reference forces a device sync every
  step by calling ``.item()`` immediately — train_eval_func_new_cp5.py
  :616-675).

With a 1-device mesh all of this degenerates to single-device training,
so the CLI uses one code path regardless of topology.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CometConfig
from ..data.datasets import SequenceSample
from ..geometry.cameras import CameraSet
from ..parallel.mesh import (
    data_sharding,
    host_local_put,
    replicate_params,
    replicated,
    shard_batch,
)
from .loop import METRIC_FETCH_KEYS, make_gt_cameras, metric_block


def stack_camera_sets(cams: Sequence[CameraSet]) -> CameraSet:
    """[CameraSet([S,...])] * B -> CameraSet([B, S, ...]) (ratio -> [B])."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def build_batch(
    samples: Sequence[SequenceSample],
    queries: Sequence[np.ndarray],
) -> Tuple[jax.Array, jax.Array, CameraSet, List[CameraSet]]:
    """Stack host samples into one static-shape device batch.

    Returns (images [B,S,H,W,3], queries [B,N,2], batched gt CameraSet,
    per-sample gt CameraSets for the host metric block). Device-resident
    images (the device-preprocess fast path with keep_on_device) stack
    with jnp so they never round-trip through the host."""
    if all(isinstance(s.images, jax.Array) for s in samples):
        images = jnp.stack([s.images for s in samples])
    else:
        images = jnp.asarray(np.stack([np.asarray(s.images) for s in samples]))
    q = jnp.asarray(np.stack(queries))
    gt_list = [make_gt_cameras(s) for s in samples]
    return images, q, stack_camera_sets(gt_list), gt_list


def replicate_train_state(mesh, params, opt_state):
    """Fully replicate params + optimizer state over the mesh (non-array
    leaves, e.g. optax count schedules' static fields, pass through)."""
    params = replicate_params(mesh, params)
    sharding = replicated(mesh)
    opt_state = jax.tree_util.tree_map(
        lambda x: host_local_put(x, sharding) if hasattr(x, "shape") else x,
        opt_state,
    )
    return params, opt_state


def shard_train_inputs(mesh, images, queries, gt_cams: CameraSet):
    """Leading-axis (batch) sharding for every train-step input."""
    images, queries, gt_cams = shard_batch(mesh, (images, queries, gt_cams))
    return images, queries, gt_cams


def _host_local_view(x):
    """Fetch the rows of a (possibly multi-process global) array that live
    on THIS process. Batch-sharded arrays yield the local batch rows (in
    shard-index order, matching the local sample order); replicated arrays
    yield the full value; plain arrays pass through."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        datas = [np.asarray(s.data) for s in shards]
        if len(datas) > 1 and shards[0].index != shards[-1].index:
            return np.concatenate(datas, axis=0)
        return datas[0]
    return x


_ASYNC_COPY_WARNED = False


def start_metric_fetch(aux: Dict[str, Any]) -> Dict[str, Any]:
    """Begin the device->host transfer of the metric keys WITHOUT blocking.

    Round-4 data-bench attribution (tools/profile_data_bench.py): the
    per-chunk metric fetch cost ~200 ms FLAT regardless of batch size —
    nine sequential ``np.asarray`` calls each paying the tunnel's ~22 ms
    round trip, two of them for arrays the metric block never reads.
    ``copy_to_host_async`` queues all transfers back to back (one RTT
    total) and they complete as soon as the producing step does, so a
    caller that dispatches the NEXT step before materializing these
    metrics hides the fetch entirely behind device compute."""
    out = {k: aux[k] for k in METRIC_FETCH_KEYS if k in aux}
    for v in out.values():
        if isinstance(v, jax.Array) and v.is_fully_addressable:
            try:
                v.copy_to_host_async()
            except (NotImplementedError, RuntimeError) as e:
                # backends without async copy degrade to the synchronous
                # fetch; warn ONCE so a persistent failure (which would
                # silently cost ~200 ms/chunk) is visible
                global _ASYNC_COPY_WARNED
                if not _ASYNC_COPY_WARNED:  # pragma: no cover
                    _ASYNC_COPY_WARNED = True
                    import warnings

                    warnings.warn(
                        "copy_to_host_async unavailable on this backend "
                        f"({e!r}); metric fetch falls back to synchronous "
                        "transfers", RuntimeWarning,
                    )
    return out


def batch_metrics(
    aux: Dict[str, Any], gt_list: Sequence[CameraSet],
    seq_names: Optional[Sequence[str]] = None,
) -> List[Dict[str, float]]:
    """Per-sample host metric rows from a batched step output.

    Pairwise metrics must not mix frames across sequences, so the batch is
    sliced per sample before the float64 metric block. In multi-process
    runs only THIS process's batch rows are addressable; they correspond
    one-to-one with ``gt_list`` (the local samples). ``seq_names`` adds
    the per-scene AUC keys (mesh-batched eval)."""
    aux = start_metric_fetch(aux)
    # materialize ONCE per key: slicing a jax.Array per sample inside the
    # loop would dispatch a device gather (plus a tunnel round trip) per
    # (key, sample) pair — 28 round trips per chunk of 4
    aux = {
        k: np.asarray(_host_local_view(v)) if hasattr(v, "shape") else v
        for k, v in aux.items()
    }
    rows = []
    for b, gt in enumerate(gt_list):
        sample_out = {
            k: (v[b] if hasattr(v, "ndim") and v.ndim >= 2 else v)
            for k, v in aux.items()
        }
        name = seq_names[b] if seq_names else ""
        rows.append(metric_block(sample_out, gt, name))
    return rows


def fit_epoch(
    train_step: Callable,
    params,
    opt_state,
    dataset,
    seed_fn: Callable[[SequenceSample], np.ndarray],
    batch_size: int,
    order: np.ndarray,
    mesh=None,
    on_metrics: Optional[Callable[[int, List[Dict[str, float]]], None]] = None,
    prefetch_depth: int = 2,
):
    """One data-parallel epoch; returns (params, opt_state, n_steps).

    ``order`` is this process's (already strided) sample-index order.
    Batches are produced on a prefetch thread; the metric fetch for step N
    happens after step N+1 is dispatched (async observability).
    """
    from ..data.prefetch import prefetch

    n_steps = len(order) // batch_size
    if n_steps == 0:
        return params, opt_state, 0

    def produce(i: int):
        idxs = order[i * batch_size : (i + 1) * batch_size]
        samples = [dataset[int(j)] for j in idxs]
        queries = [seed_fn(s) for s in samples]
        return build_batch(samples, queries)

    pending = None  # (step_idx, aux, gt_list) awaiting host metric fetch
    for i, (images, queries, gt_b, gt_list) in enumerate(
        prefetch(produce, n_steps, depth=prefetch_depth)
    ):
        if mesh is not None:
            images, queries, gt_b = shard_train_inputs(
                mesh, images, queries, gt_b
            )
        params, opt_state, aux = train_step(
            params, opt_state, images, queries, gt_b
        )
        if on_metrics is not None:
            aux = start_metric_fetch(aux)
        if pending is not None and on_metrics is not None:
            pi, paux, pgt = pending
            on_metrics(pi, batch_metrics(paux, pgt))
        pending = (i, aux, gt_list)
    if pending is not None and on_metrics is not None:
        pi, paux, pgt = pending
        on_metrics(pi, batch_metrics(paux, pgt))
    return params, opt_state, n_steps


def process_local_order(
    rng: np.random.Generator, n: int, shuffle: bool = True
) -> np.ndarray:
    """Per-process index stride over a shuffled epoch order — the
    deterministic DistributedSampler replacement (SURVEY §2.3). Every
    process must draw from an identically-seeded rng so the global
    permutation agrees."""
    order = rng.permutation(n) if shuffle else np.arange(n)
    return order[jax.process_index() :: jax.process_count()]
