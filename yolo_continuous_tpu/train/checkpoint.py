"""Checkpoint save/restore (params + EMA + optimizer + step).

The reference persists only ``net.state_dict()`` on a new best train loss
(``train.py:103-116``) and resumes weights-only (``train.py:38-39``);
optimizer/scheduler/epoch state is lost across restarts (SURVEY §5).
Here a checkpoint is the full training state, so step-level resume is
exact. Format: flax msgpack (single file, host-agnostic).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.tree.map(np.asarray, state)
    blob = serialization.to_bytes(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: a crash never corrupts the checkpoint


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(template, blob)


def try_load(path: str, template: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    if path and os.path.exists(path):
        return load_checkpoint(path, template)
    return None
