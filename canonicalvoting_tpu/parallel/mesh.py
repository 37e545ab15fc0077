"""Device-mesh helpers.

Distributed execution is a NEW capability relative to the reference (which is
single-process single-GPU — SURVEY section 2 documents the total absence of
any distributed backend). Parallelism follows the JAX idiom: declare a mesh,
annotate shardings, let XLA/GSPMD insert the collectives over ICI.
Axes: 'data' = scene-level data parallelism; 'model' = tensor parallelism
over conv output channels.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def factor_mesh(n_devices: int):
    """(data, model) factorization: TP=2 when even, else pure DP."""
    if n_devices % 2 == 0 and n_devices >= 2:
        return n_devices // 2, 2
    return n_devices, 1
