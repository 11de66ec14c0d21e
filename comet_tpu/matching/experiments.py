"""Experiment checkpoint management for the matching stack.

Parity target: gluefactory/utils/experiments.py:22-140
(``list_checkpoints`` / ``get_last_checkpoint`` / ``get_best_checkpoint``
/ ``delete_old_checkpoints`` / ``save_experiment`` / ``load_experiment``).
The reference stores torch ``checkpoint_{n}.tar`` dicts with model,
optimizer, conf, and best-eval bookkeeping inside an experiment
directory; here a checkpoint is a flax msgpack tree ``{"params", "opt"}``
plus a JSON sidecar carrying the experiment conf, step, loss, and eval
metric. ``checkpoint_best`` mirrors the reference's best-eval copy
(gluefactory/train.py:560-575 keeps the minimum of ``conf.train.best_key``).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

from flax import serialization

_CKPT_RE = re.compile(r"^checkpoint_(\d+)\.msgpack$")
BEST_NAME = "checkpoint_best.msgpack"


def _sidecar(path: str) -> str:
    return path[: -len(".msgpack")] + ".json"


def list_checkpoints(exp_dir: str) -> List[Tuple[int, str]]:
    """All numbered checkpoints in an experiment dir, (step, path),
    unsorted (experiments.py:22-34)."""
    if not os.path.isdir(exp_dir):
        return []
    out = []
    for name in os.listdir(exp_dir):
        m = _CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(exp_dir, name)))
    return out


def get_last_checkpoint(exp_dir: str) -> str:
    """Path of the highest-step checkpoint (experiments.py:37-43)."""
    ckpts = list_checkpoints(exp_dir)
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints under {exp_dir}")
    return sorted(ckpts)[-1][1]


def get_best_checkpoint(exp_dir: str) -> str:
    """Path of the best-eval checkpoint copy (experiments.py:46-49)."""
    return os.path.join(exp_dir, BEST_NAME)


def delete_old_checkpoints(exp_dir: str, num_keep: int) -> None:
    """Keep only the ``num_keep`` newest numbered checkpoints
    (experiments.py:52-62; checkpoint_best is never deleted)."""
    ckpts = sorted(list_checkpoints(exp_dir))[::-1]
    for step, path in ckpts[num_keep:]:
        os.unlink(path)
        side = _sidecar(path)
        if os.path.exists(side):
            os.unlink(side)


def save_experiment(
    exp_dir: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    conf: Optional[Dict] = None,
    loss: Optional[float] = None,
    eval_metric: Optional[float] = None,
    best_eval: Optional[float] = None,
    num_keep: int = 5,
) -> Tuple[str, float]:
    """Write ``checkpoint_{step}.msgpack`` (+ JSON sidecar), rotate old
    checkpoints, and refresh ``checkpoint_best`` when ``eval_metric``
    improves (smaller is better, like the reference's loss-keyed
    ``best_eval``). Returns (path, new_best_eval)."""
    os.makedirs(exp_dir, exist_ok=True)
    path = os.path.join(exp_dir, f"checkpoint_{step:08d}.msgpack")
    tree = {"params": params}
    if opt_state is not None:
        tree["opt"] = opt_state
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    meta = {
        "step": int(step),
        "conf": conf,
        "loss": None if loss is None else float(loss),
        "eval": None if eval_metric is None else float(eval_metric),
    }
    with open(_sidecar(path), "w") as f:
        json.dump(meta, f)

    new_best = best_eval
    metric = eval_metric if eval_metric is not None else loss
    if metric is not None and (best_eval is None or metric < best_eval):
        shutil.copyfile(path, os.path.join(exp_dir, BEST_NAME))
        shutil.copyfile(_sidecar(path), _sidecar(get_best_checkpoint(exp_dir)))
        new_best = float(metric)
    delete_old_checkpoints(exp_dir, num_keep)
    return path, (float("inf") if new_best is None else new_best)


def load_checkpoint(
    path_or_dir: str, template: Any = None, get_last: bool = False
):
    """Load a checkpoint tree (+ meta). ``path_or_dir`` may be a file, or
    an experiment dir — then ``checkpoint_best`` (default) or the last
    numbered checkpoint (``get_last=True``) is resolved, mirroring
    ``load_experiment`` (experiments.py:64-91). With a ``template``
    pytree, leaves restore onto it (full typed state incl. optimizer);
    without one the raw msgpack dict tree is returned — directly usable
    as flax ``apply`` variables."""
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        path = (
            get_last_checkpoint(path_or_dir)
            if get_last
            else get_best_checkpoint(path_or_dir)
        )
        if not os.path.exists(path):  # no best yet -> fall back to last
            path = get_last_checkpoint(path_or_dir)
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        tree = serialization.from_bytes(template, data)
    else:
        tree = serialization.msgpack_restore(data)
    meta = {}
    if os.path.exists(_sidecar(path)):
        with open(_sidecar(path)) as f:
            meta = json.load(f)
    return tree, meta


def load_experiment_into_pipeline(pipeline, path_or_dir: str) -> Dict:
    """Inject a trained matcher checkpoint into a built TwoViewPipeline
    whose matcher is a wrapped flax module (configs.wrap_flax_matcher):
    assigns the restored params to the wrapper's holder so the next call
    applies trained weights instead of lazy random init. Returns the
    checkpoint meta."""
    matcher = pipeline.matcher
    holder = getattr(matcher, "holder", None)
    if holder is None:
        raise TypeError(
            "pipeline matcher is not a wrapped flax module; "
            "only trainable matchers load experiment checkpoints"
        )
    tree, meta = load_checkpoint(path_or_dir)
    holder["params"] = tree["params"] if "params" in tree else tree
    return meta
