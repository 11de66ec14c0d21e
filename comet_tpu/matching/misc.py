"""Pytree/batch plumbing for multi-view prediction dicts.

Role models: gluefactory/utils/tensor.py (map_tensor:13, batch_to_numpy:26,
rbd:37, index_batch:45) and gluefactory/utils/misc.py (to_view:4, get_view:8,
get_twoview:14, stack_twoviews:29, unstack_twoviews:40). Device placement
(`batch_to_device`) becomes `jax.device_put`; arrays are numpy or JAX.

The view-suffix convention: per-view keys end in a digit ("keypoints0"),
pairwise keys end in "ItoJ" ("matches0to1"); these utilities re-index them
so an N-view batch can be fed to two-view models (TripletPipeline uses
stack_twoviews to run one matcher over the 0to1/0to2/1to2 pairs in a
single batched call — the batching idiom TPUs prefer anyway).
"""

from __future__ import annotations

import numpy as np

import jax


def map_tensor(input_, func):
    """Apply `func` to every leaf of a nested dict/list structure,
    passing strings/None through (tensor.py:13-23)."""
    if isinstance(input_, (str, bytes)):
        return input_
    if isinstance(input_, dict):
        return {k: map_tensor(v, func) for k, v in input_.items()}
    if isinstance(input_, (list, tuple)):
        return type(input_)(map_tensor(v, func) for v in input_)
    if input_ is None:
        return None
    return func(input_)


def batch_to_numpy(batch):
    return map_tensor(batch, lambda a: np.asarray(a))


def batch_to_device(batch, device=None):
    """tensor.py:30 — on JAX, explicit placement is jax.device_put."""
    return map_tensor(batch, lambda a: jax.device_put(a, device))


def rbd(data: dict) -> dict:
    """Remove the leading batch dimension from array/list values
    (tensor.py:37-42)."""
    return {
        k: v[0] if isinstance(v, (np.ndarray, jax.Array, list)) else v
        for k, v in data.items()
    }


def index_batch(tensor_dict):
    """Yield per-example sub-dicts of a batched dict (tensor.py:45-48)."""
    batch_size = len(next(iter(tensor_dict.values())))
    for i in range(batch_size):
        yield map_tensor(tensor_dict, lambda t: t[i])


def to_view(data: dict, i) -> dict:
    """Suffix every key with view index i (misc.py:4)."""
    return {k + str(i): v for k, v in data.items()}


def get_view(data: dict, i) -> dict:
    """Select view i: global keys + de-suffixed view-i keys (misc.py:8)."""
    i = str(i)
    data_g = {k: v for k, v in data.items() if not k[-1].isnumeric()}
    data_i = {k[:-1]: v for k, v in data.items() if k[-1] == i}
    return {**data_g, **data_i}


def get_twoview(data: dict, idx: str) -> dict:
    """Re-index an N-view dict to a standard two-view dict for the pair
    `idx` == "LtoR" (misc.py:14-26): pairwise LtoR keys become 0to1,
    view-L keys become *0, view-R keys become *1."""
    li, ri = idx[0], idx[-1]
    if idx != f"{li}to{ri}":
        raise ValueError(f"expected 'LtoR' pair index, got {idx!r}")
    data_lr = {
        k[:-4] + "0to1": v for k, v in data.items() if k[-4:] == f"{li}to{ri}"
    }
    data_rl = {
        k[:-4] + "1to0": v for k, v in data.items() if k[-4:] == f"{ri}to{li}"
    }
    data_l = {
        k[:-1] + "0": v
        for k, v in data.items()
        if k[-1:] == li and k[-3:-1] != "to"
    }
    data_r = {
        k[:-1] + "1": v
        for k, v in data.items()
        if k[-1:] == ri and k[-3:-1] != "to"
    }
    return {**data_lr, **data_rl, **data_l, **data_r}


def stack_twoviews(data: dict, indices=("0to1", "0to2", "1to2")) -> dict:
    """Concatenate the given pairs along the batch axis so one two-view
    model call serves all of them (misc.py:29-37)."""
    idx0 = indices[0]
    m_data = dict(data[idx0]) if idx0 in data else get_twoview(data, idx0)
    for idx in indices[1:]:
        data_i = data[idx] if idx in data else get_twoview(data, idx)
        for k, v in data_i.items():
            m_data[k] = np.concatenate([np.asarray(m_data[k]), np.asarray(v)], axis=0)
    return m_data


def unstack_twoviews(data: dict, batch_size: int,
                     indices=("0to1", "0to2", "1to2")) -> dict:
    """Inverse of stack_twoviews (misc.py:40-44)."""
    return {
        idx: {k: v[i * batch_size: (i + 1) * batch_size] for k, v in data.items()}
        for i, idx in enumerate(indices)
    }
