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


def _adapt_dense_layout(raw, tgt):
    """Reconcile legacy `{'tensor': (2, lead..., modes...)}` dense spectral
    leaves with the mode-major `{'mmK': (2, modes..., lead...)}` storage
    (ops/factorized.py:init_factorized) — in either direction — so
    checkpoints written before/after the layout change keep loading."""
    if not (isinstance(raw, dict) and isinstance(tgt, dict)):
        return raw
    mm_t = [k for k in tgt if k.startswith("mm")]
    if "tensor" in raw and len(raw) == 1 and len(mm_t) == 1:
        lead = int(mm_t[0][2:])
        a = raw["tensor"]
        perm = (0, *range(1 + lead, a.ndim), *range(1, 1 + lead))
        return {mm_t[0]: a.transpose(perm)}
    mm_r = [k for k in raw if k.startswith("mm")]
    if "tensor" in tgt and len(tgt) == 1 and len(mm_r) == 1:
        lead = int(mm_r[0][2:])
        a = raw[mm_r[0]]
        perm = (0, *range(a.ndim - lead, a.ndim), *range(1, a.ndim - lead))
        return {"tensor": a.transpose(perm)}
    return {k: _adapt_dense_layout(v, tgt.get(k)) if k in tgt else v
            for k, v in raw.items()}


def load_msgpack(path: str, target: Optional[Any] = None):
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    raw = serialization.msgpack_restore(data)
    raw = _adapt_dense_layout(raw, serialization.to_state_dict(target))
    return serialization.from_state_dict(target, raw)


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
