"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> jax.sharding.Mesh:
    """Create a ``(data, model)`` mesh over the given (default: all) devices.

    With only one of ``data``/``model`` given, the other absorbs the
    remaining devices; with neither, all devices go to ``data`` (pure DP).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data is None and model is None:
        data, model = n, 1
    elif data is None:
        if n % model:
            raise ValueError(f"model={model} does not divide {n} devices")
        data = n // model
    elif model is None:
        if n % data:
            raise ValueError(f"data={data} does not divide {n} devices")
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, model)
    return jax.sharding.Mesh(arr, (DATA_AXIS, MODEL_AXIS))
