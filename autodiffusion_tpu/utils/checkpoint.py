"""Checkpoint save/load for params and train state.

Replaces the reference's torch .pt checkpoint files
(train_util.py:252-275 save; dist_util.py:56-63 load): flax msgpack for
single-file param trees (model{step}.msgpack, ema_{rate}_{step}.msgpack,
opt{step}.msgpack naming kept step-parseable like
parse_resume_step_from_filename, train_util.py:780-792).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax

__all__ = ["save_tree", "load_tree", "load_tree_for_model",
           "parse_step_from_filename", "find_latest_checkpoint"]


def save_tree(path: str, tree: Any) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(jax.device_get(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_tree(path: str, target: Any) -> Any:
    """Load into the structure of ``target`` (shape/dtype template)."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def load_tree_for_model(path: str, model, init_args) -> Any:
    """load_tree with the param template derived from ``model.init`` via
    eval_shape (host numpy zeros — no device traffic). The one restore
    path shared by every CLI msgpack branch."""
    import numpy as np

    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), *init_args))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    return load_tree(path, template)


def parse_step_from_filename(name: str) -> int:
    """model123456.msgpack / ema_0.9999_123456.msgpack -> 123456
    (train_util.py:780-792)."""
    # (\d+), not (\d{6}): steps past 999999 widen beyond the :06d pad
    # and truncating to the last six digits would rank them lowest
    m = re.search(r"(\d+)\.(msgpack|pt)$", name)
    return int(m.group(1)) if m else 0


def find_latest_checkpoint(dir: str, prefix: str = "model") -> Optional[Tuple[str, int]]:
    if not os.path.isdir(dir):
        return None
    best = None
    for name in os.listdir(dir):
        if name.startswith(prefix) and name.endswith(".msgpack"):
            step = parse_step_from_filename(name)
            if best is None or step > best[1]:
                best = (os.path.join(dir, name), step)
    return best
