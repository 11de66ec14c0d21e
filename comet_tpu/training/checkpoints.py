"""Checkpointing with orbax: epoch-dir convention + auto-resume.

Parity target: the reference's two-layer scheme (train_util.py:165-309,
1852-1862; train_e2epose2.py:92-113, 157-163): full training state saved to
``ckpt_{epoch:06d}`` directories, auto-resume finds the latest by glob.
Weights-only import from torch .bin files goes through
tools/convert_torch_weights.py.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


_CKPT_RE = re.compile(r"^ckpt_(\d{6})$")


def save_checkpoint(ckpt_dir: str, epoch: int, state: Any):
    """Save a pytree (params/opt_state/epoch/stats) to ckpt_{epoch:06d}."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_{epoch:06d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def find_last_checkpoint(ckpt_dir: str) -> Optional[Tuple[int, str]]:
    """Locate the newest ckpt_NNNNNN dir (train_util.py:1852-1862)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if m:
            epoch = int(m.group(1))
            if best is None or epoch > best[0]:
                best = (epoch, os.path.join(ckpt_dir, name))
    return best


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by save_checkpoint (shapes from ``target``)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def auto_resume(ckpt_dir: str, target: Any) -> Tuple[int, Any]:
    """Resume from the latest checkpoint if present; returns (epoch, state)."""
    found = find_last_checkpoint(ckpt_dir)
    if found is None:
        return 0, target
    epoch, path = found
    return epoch + 1, restore_checkpoint(path, target)
