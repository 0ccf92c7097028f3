"""Checkpointing: orbax for directory checkpoints, flax msgpack for single
files.

reference: ad-hoc torch.save/torch.load across the drivers
(run_pde_observers.py:313, libs/pino_utils/utils.py:156-195,
train_dino.py:253-263) — here one uniform pytree interface.
"""
from __future__ import annotations

import os
from typing import Any, Optional

from flax import serialization


def save_msgpack(path: str, pytree) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(pytree))
    return path


def load_msgpack(path: str, target: Optional[Any] = None):
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def save_orbax(path: str, pytree) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, pytree, force=True)
    return path


def load_orbax(path: str, target: Optional[Any] = None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def save_checkpoint(path: str, pytree) -> str:
    """Dispatch on extension: .msgpack -> single file, else orbax dir."""
    if path.endswith(".msgpack"):
        return save_msgpack(path, pytree)
    return save_orbax(path, pytree)


def load_checkpoint(path: str, target: Optional[Any] = None):
    if path.endswith(".msgpack"):
        return load_msgpack(path, target)
    return load_orbax(path, target)
