"""Model checkpointing.

The reference's checkpoint story is serde/bincode serialization of the
whole model — hyperparameters, parameter arrays, and the RNG state
(``src/models/lstm.rs:38,204,386``; ``Cargo.toml:18``). The TPU-native
equivalent saves a directory with:

* ``state.msgpack`` — the parameter pytree and the JAX PRNG key (the only
  RNG the training loop consumes — epoch shuffles and negative sampling
  both run on device from it), via flax's msgpack serialization;
* ``config.json`` — hyperparameters + model type + a content hash of
  ``state.msgpack``, written LAST as the commit marker: a crash between
  the two writes leaves a config whose hash does not match the new state,
  which ``load_model`` rejects — never a silently inconsistent pair that
  loads (shape checks alone cannot catch a stale config whose dims happen
  to coincide).

Round-trips restore training exactly.
"""

from __future__ import annotations

import hashlib
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

    state = {
        "params": jax.tree_util.tree_map(np.asarray, model._params),
        "key": np.asarray(model._key),
    }
    blob = serialization.msgpack_serialize(state)
    tmp_state = p / "state.msgpack.tmp"
    tmp_state.write_bytes(blob)
    os.replace(tmp_state, p / "state.msgpack")

    # Config last: it is the checkpoint's commit marker, and it carries the
    # state blob's hash so a crash between the two replaces (new state, old
    # config) can never load as a silently mismatched pair.
    config = model.hyper.to_dict()
    config["state_sha256"] = hashlib.sha256(blob).hexdigest()
    tmp_cfg = p / "config.json.tmp"
    tmp_cfg.write_text(json.dumps(config, indent=2))
    os.replace(tmp_cfg, p / "config.json")


def load_model(path: str):
    from ..models import attention, ewma, gru, lstm

    p = Path(path)
    config = json.loads((p / "config.json").read_text())
    config.pop("np_rng_state", None)  # legacy field, no longer used
    blob = (p / "state.msgpack").read_bytes()
    want_hash = config.pop("state_sha256", None)
    if want_hash is not None and hashlib.sha256(blob).hexdigest() != want_hash:
        raise ValueError(
            f"Checkpoint state/config mismatch at {path}: state.msgpack does "
            "not match the hash recorded in config.json — the directory "
            "holds files from different saves."
        )
    model_type = config["model_type"]
    if model_type == "lstm":
        hyper = lstm.Hyperparameters.from_dict(config)
    elif model_type == "ewma":
        hyper = ewma.Hyperparameters.from_dict(config)
    elif model_type == "attention":
        hyper = attention.Hyperparameters.from_dict(config)
    elif model_type == "gru":
        hyper = gru.Hyperparameters.from_dict(config)
    else:
        raise ValueError(f"Unknown model_type: {model_type}")

    model = hyper.build()
    state = serialization.msgpack_restore(blob)

    table = state["params"]["item_table"]
    want = (config["num_items"], config["item_embedding_dim"] + 1)
    if tuple(table.shape) != want:
        raise ValueError(
            f"Checkpoint state/config mismatch at {path}: item_table shape "
            f"{tuple(table.shape)} but config expects {want} — the "
            "checkpoint directory holds files from different saves."
        )

    model._params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    model._key = jnp.asarray(state["key"])
    return model
