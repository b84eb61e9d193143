"""Combinatorial smoke: feature flags must compose.

Every (tower, loss, optimizer, packed, dtype, mesh, sparse) combination
must fit, evaluate, serve, and checkpoint without error — guards against
features that work alone but break together.
"""

import numpy as np
import pytest

import sbr_rs_tpu as sbr
from sbr_rs_tpu import data as D
from sbr_rs_tpu.models import Loss, Optimizer, ewma, gru, lstm
from sbr_rs_tpu.parallel import make_mesh


def _toy(num_users=24, num_items=32, seq_len=9, seed=0):
    rng = np.random.default_rng(seed)
    return D.Interactions.from_arrays(
        np.repeat(np.arange(num_users), seq_len),
        rng.integers(0, num_items, num_users * seq_len),
        np.tile(np.arange(seq_len), num_users),
        num_users,
        num_items,
    ).to_compressed()


CASES = [
    # (family, loss, optimizer, packed, dtype, mesh, sparse)
    (lstm, Loss.WARP, Optimizer.ADAGRAD, True, "bfloat16", False, True),
    (lstm, Loss.BPR, Optimizer.ADAM, True, "float32", True, None),
    (ewma, Loss.WARP, Optimizer.ADAM, True, "bfloat16", False, None),
    (ewma, Loss.HINGE, Optimizer.ADAGRAD, False, "bfloat16", True, True),
    (lstm, Loss.HINGE, Optimizer.ADAM, False, "float32", True, True),
    (ewma, Loss.BPR, Optimizer.ADAGRAD, True, "float32", True, False),
    (gru, Loss.WARP, Optimizer.ADAM, True, "float32", False, None),
    (gru, Loss.HINGE, Optimizer.ADAGRAD, True, "bfloat16", True, True),
]


@pytest.mark.parametrize("family,loss,opt,packed,dtype,mesh,sparse", CASES)
def test_feature_combination(family, loss, opt, packed, dtype, mesh, sparse, tmp_path):
    inter = _toy()
    hp = (
        family.Hyperparameters(inter.num_items, 6)
        .embedding_dim(8)
        .learning_rate(0.05)
        .loss(loss)
        .optimizer(opt)
        .num_epochs(2)
        .batch_size(8)
        .packed(packed)
        .table_dtype(dtype)
        .sparse_updates(sparse)
        .from_seed(0)
    )
    if mesh:
        hp = hp.mesh(make_mesh(data=4, model=2))
    model = hp.build()
    loss_val = model.fit(inter)
    assert np.isfinite(loss_val)
    mrr = sbr.evaluation.mrr_score(model, inter)
    assert np.isfinite(mrr)
    recs = model.recommend([1, 2, 3], k=4)
    assert len(recs) == 4
    # checkpoint round-trip for the non-mesh cases (mesh placement is not
    # part of the checkpoint contract)
    if not mesh:
        path = str(tmp_path / "ckpt")
        model.save(path)
        restored = type(model).load(path)
        np.testing.assert_allclose(
            restored.user_representation([1, 2]).user_embedding,
            model.user_representation([1, 2]).user_embedding,
            rtol=1e-5,
        )
