"""Model checkpointing.

The reference's checkpoint story is serde/bincode serialization of the
whole model — hyperparameters, parameter arrays, *and the RNG state*
(``src/models/lstm.rs:38,204,386``; ``Cargo.toml:18``). The TPU-native
equivalent saves a directory with:

* ``config.json`` — hyperparameters (+ model type + host RNG state),
* ``state.msgpack`` — the parameter pytree and the JAX PRNG key, via
  flax's msgpack serialization.

Round-trips restore training exactly: host shuffles and device sampling
resume from the saved RNG states.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_model(model, path: str) -> None:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    config = model.hyper.to_dict()
    config["np_rng_state"] = model._np_rng.bit_generator.state
    tmp_cfg = p / "config.json.tmp"
    tmp_cfg.write_text(json.dumps(config, indent=2))
    os.replace(tmp_cfg, p / "config.json")

    state = {
        "params": jax.tree_util.tree_map(np.asarray, model._params),
        "key": np.asarray(model._key),
    }
    blob = serialization.msgpack_serialize(state)
    tmp_state = p / "state.msgpack.tmp"
    tmp_state.write_bytes(blob)
    os.replace(tmp_state, p / "state.msgpack")


def load_model(path: str):
    from ..models import ewma, lstm

    p = Path(path)
    config = json.loads((p / "config.json").read_text())
    np_rng_state = config.pop("np_rng_state", None)
    model_type = config["model_type"]
    if model_type == "lstm":
        hyper = lstm.Hyperparameters.from_dict(config)
    elif model_type == "ewma":
        hyper = ewma.Hyperparameters.from_dict(config)
    else:
        raise ValueError(f"Unknown model_type: {model_type}")

    model = hyper.build()
    state = serialization.msgpack_restore((p / "state.msgpack").read_bytes())
    model._params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    model._key = jnp.asarray(state["key"])
    if np_rng_state is not None:
        model._np_rng.bit_generator.state = np_rng_state
    return model
