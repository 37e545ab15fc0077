"""Checkpoint save/restore.

A capability upgrade over the reference (which saves bare state_dicts every
10 epochs, train_joint.py:290-291, and has NO weight-reload path for its
start_epoch config — resume is manual). Here full train state (params +
batch stats + optimizer state + epoch) round-trips, enabling true
preemption-safe resume.

Format: flax msgpack (`flax.serialization.to_bytes`) of
``{"epoch": int, "state": <train-state pytree>}`` — a self-contained binary
file with no pickle involved, restored against a structural template.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.serialization
import jax
import numpy as np


def save_checkpoint(path: str, state, epoch: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"epoch": int(epoch), "state": jax.device_get(state)}
    data = flax.serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore_checkpoint(path: str, state_template):
    """Restore into a structurally-identical template; returns (state, epoch)."""
    with open(path, "rb") as f:
        data = f.read()
    template = {"epoch": 0, "state": jax.device_get(state_template)}
    payload = flax.serialization.from_bytes(template, data)
    return payload["state"], int(payload["epoch"])


def latest_checkpoint(directory: str, prefix: str = "epoch") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".ckpt"):
            try:
                e = int(name[len(prefix):-5])
            except ValueError:
                continue
            if e > best_epoch:
                best, best_epoch = os.path.join(directory, name), e
    return best


def export_torch_style(path: str, variables) -> None:
    """Write weights in the reference's checkpoint format: a ``torch.save``d
    state_dict (reference train_joint.py:291), loadable by the reference's
    ``model.load_state_dict(torch.load(path))``. Requires torch."""
    import torch

    from canonicalvoting_tpu.utils.torch_convert import (
        reference_state_dict_template,
    )

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          reference_state_dict_template(jax.device_get(variables)).items()}
    torch.save(sd, path)
