"""Flax param serialization helpers (msgpack weight files).

The torch->flax converter (tools/convert_torch_weights.py) emits .msgpack
files; these helpers load/save them against a param-pytree template.
"""

from __future__ import annotations

from typing import Any

from flax import serialization


def save_params_msgpack(path: str, params: Any) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params_msgpack(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
