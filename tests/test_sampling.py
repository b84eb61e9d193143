"""WARP selection rule: exact match with a serial reference implementation."""

import numpy as np
import jax.numpy as jnp

from sbr_rs_tpu.ops.sampling import WARP_CANDIDATES, warp_select


def _reference_select(pos, cands):
    """The reference's serial rejection loop
    (``src/models/sequence_model.rs:58-65``): accept the first draw with
    1 - pos + neg > 0; after 5 draws keep the last one."""
    for k, c in enumerate(cands):
        if 1.0 - pos + c > 0.0:
            return k
    return len(cands) - 1


def test_warp_select_matches_serial_reference():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(200,)).astype(np.float32) * 2
    cands = rng.normal(size=(200, WARP_CANDIDATES)).astype(np.float32) * 2
    got = np.asarray(warp_select(jnp.asarray(pos), jnp.asarray(cands)))
    want = np.array([_reference_select(p, c) for p, c in zip(pos, cands)])
    np.testing.assert_array_equal(got, want)


def test_warp_select_edge_cases():
    # No violator -> last index.
    pos = jnp.asarray([10.0])
    cands = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]])
    assert int(warp_select(pos, cands)[0]) == 4
    # Every candidate violates -> first index.
    assert int(warp_select(-pos, cands)[0]) == 0
    # Margin exactly zero does NOT violate (strict >).
    pos = jnp.asarray([1.0])
    cands = jnp.asarray([[0.0, 0.5, 0.0, 0.0, 0.0]])
    assert int(warp_select(pos, cands)[0]) == 1
