"""Closed-form loss checks (exact reference formulas,
`src/models/lstm.rs:313-320`)."""

import numpy as np
import jax.numpy as jnp

from sbr_rs_tpu.models import Loss
from sbr_rs_tpu.ops.losses import pairwise_loss


def test_bpr_is_sigmoid_of_difference():
    pos = jnp.asarray([2.0, 0.0])
    neg = jnp.asarray([0.0, 0.0])
    out = np.asarray(pairwise_loss(Loss.BPR, pos, neg))
    np.testing.assert_allclose(out, [1 / (1 + np.exp(2.0)), 0.5], rtol=1e-5)


def test_hinge_margin():
    pos = jnp.asarray([3.0, 0.5, 0.0])
    neg = jnp.asarray([0.0, 0.0, 0.5])
    out = np.asarray(pairwise_loss(Loss.HINGE, pos, neg))
    np.testing.assert_allclose(out, [0.0, 0.5, 1.5], rtol=1e-6)


def test_warp_same_formula_as_hinge():
    pos = jnp.asarray([0.3])
    neg = jnp.asarray([0.9])
    np.testing.assert_allclose(
        np.asarray(pairwise_loss(Loss.WARP, pos, neg)),
        np.asarray(pairwise_loss(Loss.HINGE, pos, neg)),
    )
