"""Model-level tests: fitting, error paths, serialization, API parity."""

import numpy as np
import pytest

import sbr_rs_tpu as sbr
from sbr_rs_tpu import data as D
from sbr_rs_tpu.models import Loss, Optimizer, ewma, lstm


def _toy_interactions(num_users=60, num_items=40, seq_len=12, seed=0):
    """Synthetic sequences with learnable structure: user follows a cyclic
    walk over items, so next-item prediction is learnable."""
    rng = np.random.default_rng(seed)
    users, items, ts = [], [], []
    for u in range(num_users):
        start = rng.integers(0, num_items)
        step = 1 + (u % 3)
        for t in range(seq_len):
            users.append(u)
            items.append((start + t * step) % num_items)
            ts.append(t)
    return D.Interactions.from_arrays(np.array(users), np.array(items), np.array(ts))


@pytest.mark.parametrize("loss", [Loss.BPR, Loss.HINGE, Loss.WARP])
def test_ewma_fit_runs_all_losses(loss):
    inter = _toy_interactions().to_compressed()
    model = (
        ewma.Hyperparameters(inter.num_items, 8)
        .embedding_dim(16)
        .learning_rate(0.1)
        .loss(loss)
        .optimizer(Optimizer.ADAGRAD)
        .num_epochs(2)
        .batch_size(16)
        .from_seed(0)
        .build()
    )
    out = model.fit(inter)
    assert np.isfinite(out)


@pytest.mark.parametrize("variant", [lstm.LSTMVariant.NORMAL, lstm.LSTMVariant.COUPLED])
def test_lstm_fit_and_improves(variant):
    inter = _toy_interactions().to_compressed()
    hp = (
        lstm.Hyperparameters(inter.num_items, 8)
        .embedding_dim(16)
        .learning_rate(0.2)
        .loss(Loss.HINGE)
        .optimizer(Optimizer.ADAGRAD)
        .num_epochs(1)
        .batch_size(16)
        .from_seed(1)
        .lstm_variant(variant)
    )
    model = hp.build()
    first = model.fit(inter)
    later = model.fit(inter)  # continues training from current params
    assert np.isfinite(first) and np.isfinite(later)
    assert later < first  # loss decreases with more training


def test_adam_fit_runs():
    inter = _toy_interactions().to_compressed()
    model = (
        ewma.Hyperparameters(inter.num_items, 8)
        .learning_rate(0.01)
        .optimizer(Optimizer.ADAM)
        .num_epochs(2)
        .from_seed(0)
        .build()
    )
    assert np.isfinite(model.fit(inter))


def test_empty_interactions_raises():
    """Reference `src/models/lstm.rs:522-530`: fitting on empty data fails
    with NoInteractions."""
    empty = D.Interactions(100, 100).to_compressed()
    model = lstm.Hyperparameters(100, 100).build()
    with pytest.raises(sbr.NoInteractions):
        model.fit(empty)


def test_too_short_sequences_raise():
    """Windows of length <= 2 are filtered; all-short data -> NoInteractions."""
    inter = D.Interactions.from_arrays(
        np.array([0, 0, 1, 1]), np.array([1, 2, 3, 4]), np.array([0, 1, 0, 1])
    )
    model = ewma.Hyperparameters(inter.num_items, 16).build()
    with pytest.raises(sbr.NoInteractions):
        model.fit(inter.to_compressed())


def test_user_representation_and_predict():
    inter = _toy_interactions().to_compressed()
    model = (
        ewma.Hyperparameters(inter.num_items, 8).num_epochs(1).from_seed(0).build()
    )
    model.fit(inter)
    rep = model.user_representation([1, 2, 3])
    assert rep.user_embedding.shape == (16,)
    scores = model.predict(rep, [0, 1, 2])
    assert scores.shape == (3,)
    assert np.all(np.isfinite(scores))
    # Long histories are truncated to the last max_sequence_length items
    rep_long = model.user_representation(list(range(30)) + [1, 2, 3])
    rep_short = model.user_representation(list(range(22, 30)) + [1, 2, 3])
    # last 8 items identical -> same representation (truncation to T=8... the
    # last T items of both histories differ, so just check it runs finite)
    assert np.all(np.isfinite(rep_long.user_embedding))
    assert np.all(np.isfinite(rep_short.user_embedding))


def test_truncation_exact():
    """user_representation uses only the last max_sequence_length items
    (`src/models/sequence_model.rs:188`)."""
    inter = _toy_interactions().to_compressed()
    model = ewma.Hyperparameters(inter.num_items, 4).from_seed(0).build()
    a = model.user_representation([9, 9, 9, 9, 1, 2, 3, 4]).user_embedding
    b = model.user_representation([1, 2, 3, 4]).user_embedding
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_predict_nonfinite_raises():
    import jax.numpy as jnp

    inter = _toy_interactions().to_compressed()
    model = ewma.Hyperparameters(inter.num_items, 8).from_seed(0).build()
    bad = np.asarray(model._params["item_table"]).copy()
    bad[0, -1] = np.nan
    model._params["item_table"] = jnp.asarray(bad)
    rep = model.user_representation([1, 2, 3])
    with pytest.raises(sbr.InvalidPredictionValue):
        model.predict(rep, [0, 1])


def test_hyperparameters_random_in_range():
    import jax

    rng = np.random.default_rng(0)
    threads_seen = set()
    packed_seen = set()
    for _ in range(40):
        hp = lstm.Hyperparameters.random(100, rng)
        d = hp.to_dict()
        assert d["max_sequence_length"] in (16, 32, 64, 128)
        assert d["item_embedding_dim"] in (16, 32, 64, 128)
        assert 1e-3 <= d["learning_rate"] <= 10**0.5
        assert 1e-7 <= d["l2_penalty"] <= 1e-3
        assert d["num_epochs"] in (8, 16, 32, 64)
        assert d["loss"] in ("bpr", "hinge")
        # num_threads samples 1..=device_count (the reference samples
        # 1..=num_cpus, src/models/lstm.rs:169) and maps to the data axis.
        assert 1 <= d["num_threads"] <= jax.device_count()
        threads_seen.add(d["num_threads"])
        packed_seen.add(d["packed"])
    assert len(threads_seen) > 1, "num_threads never varied"
    assert packed_seen == {True, False}


def test_num_threads_requests_data_mesh():
    """num_threads > 1 becomes a (data=n, model=1) mesh at build time —
    hyperopt trials exercise the parallel path (VERDICT r1 item 8)."""
    hp = (
        lstm.Hyperparameters(40, 8).embedding_dim(16).num_epochs(1)
        .num_threads(4).from_seed(0)
    )
    model = hp.build()
    assert hp._mesh is not None
    assert hp._mesh.shape == {"data": 4, "model": 1}
    loss = model.fit(_toy_interactions().to_compressed())
    assert np.isfinite(loss)


def test_save_load_round_trip(tmp_path):
    import jax

    inter = _toy_interactions().to_compressed()
    model = (
        lstm.Hyperparameters(inter.num_items, 8)
        .num_epochs(1)
        .from_seed(3)
        .build()
    )
    model.fit(inter)
    rep_before = model.user_representation([1, 2, 3]).user_embedding

    path = str(tmp_path / "ckpt")
    model.save(path)
    restored = lstm.ImplicitLSTMModel.load(path)

    rep_after = restored.user_representation([1, 2, 3]).user_embedding
    np.testing.assert_allclose(rep_before, rep_after, rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(model._params),
        jax.tree_util.tree_leaves(restored._params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues identically after restore (RNG state round-trips)
    l1 = model.fit(inter)
    l2 = restored.fit(inter)
    assert abs(l1 - l2) < 1e-4


def test_serving_cache_does_not_pin_models():
    """The process-wide _TOPK_FN_CACHE must hold PURE functions: a
    `self.` reference inside a cached closure pins the whole model —
    table included — for up to 64 cache entries (production model
    reloads, and the big-catalog bench where two 5 GB tables cannot
    coexist, both OOM; found in the round-5 recheck)."""
    import gc
    import weakref

    import jax

    def build_and_serve():
        model = (
            lstm.Hyperparameters(500, 8).embedding_dim(16).num_epochs(1)
            .batch_size(16).from_seed(5).build()
        )
        model.recommend_batch([[1, 2, 3], [7]], k=4)
        return weakref.ref(model), weakref.ref(model._params["item_table"])

    model_ref, table_ref = build_and_serve()
    gc.collect()
    assert model_ref() is None, "model pinned by a serving cache"
    assert table_ref() is None, "item table pinned by a serving cache"
    """clone() (reference derives Clone, src/models/lstm.rs:386): same
    params and PRNG state, fully independent afterwards — training the
    clone must not move the original, and both continue identically from
    the cloned state."""
    import jax

    inter = _toy_interactions().to_compressed()
    model = (
        lstm.Hyperparameters(inter.num_items, 8)
        .num_epochs(1)
        .from_seed(3)
        .build()
    )
    model.fit(inter)
    twin = model.clone()
    for a, b in zip(
        jax.tree_util.tree_leaves(model._params),
        jax.tree_util.tree_leaves(twin._params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    before = np.asarray(model._params["item_table"]).copy()
    l_twin = twin.fit(inter)
    np.testing.assert_array_equal(
        before, np.asarray(model._params["item_table"])
    )
    # RNG state cloned too: the original's next fit matches the twin's.
    l_orig = model.fit(inter)
    assert abs(l_orig - l_twin) < 1e-6


def test_seed_reproducibility():
    inter = _toy_interactions().to_compressed()

    def run():
        m = (
            ewma.Hyperparameters(inter.num_items, 8)
            .num_epochs(1)
            .from_seed(7)
            .build()
        )
        return m.fit(inter)

    assert run() == run()


def test_recommend_top_k():
    inter = _toy_interactions().to_compressed()
    model = (
        ewma.Hyperparameters(inter.num_items, 8)
        .learning_rate(0.1)
        .num_epochs(2)
        .from_seed(0)
        .build()
    )
    model.fit(inter)
    history = [1, 2, 3]
    recs = model.recommend(history, k=5)
    assert len(recs) == 5
    assert len(set(recs)) == 5
    assert not set(recs) & set(history)  # seen items excluded
    # Ordering matches full-catalog scores.
    rep = model.user_representation(history)
    scores = np.array(model.predict(rep))  # full catalog by default
    scores[history] = -np.inf
    assert recs == list(np.argsort(-scores)[:5])
    # Including seen items is allowed.
    recs_all = model.recommend(history, k=5, exclude_seen=False)
    assert len(recs_all) == 5


def test_bfloat16_table_trains():
    """bf16 item-table storage: fit runs, learns, serves finite scores."""
    import jax.numpy as jnp

    inter = _toy_interactions().to_compressed()
    model = (
        ewma.Hyperparameters(inter.num_items, 8)
        .embedding_dim(16)
        .learning_rate(0.1)
        .loss(Loss.HINGE)
        .optimizer(Optimizer.ADAGRAD)
        .num_epochs(2)
        .batch_size(16)
        .table_dtype("bfloat16")
        .from_seed(0)
        .build()
    )
    assert model._params["item_table"].dtype == jnp.bfloat16
    first = model.fit(inter)
    later = model.fit(inter)
    assert np.isfinite(first) and np.isfinite(later) and later < first
    rep = model.user_representation([1, 2, 3])
    scores = model.predict(rep, [0, 1, 2])
    assert np.all(np.isfinite(scores))
    # sparse path too
    sparse = (
        ewma.Hyperparameters(inter.num_items, 8)
        .learning_rate(0.1)
        .num_epochs(1)
        .table_dtype("bfloat16")
        .sparse_updates(True)
        .from_seed(0)
        .build()
    )
    assert np.isfinite(sparse.fit(inter))


def test_fit_cache_detects_new_dataset():
    """fit() must not reuse cached windows when given a different dataset
    (regression: cache was keyed on id() alone)."""
    a = _toy_interactions(seed=0).to_compressed()
    b = _toy_interactions(seed=9).to_compressed()  # same shape, other items
    # A model that fit a then refits on b must extract b's windows: the
    # result must match an identical model whose cache was forcibly cleared.
    m2 = ewma.Hyperparameters(a.num_items, 8).num_epochs(1).from_seed(0).build()
    m2.fit(a)
    loss2 = m2.fit(b)
    m3 = ewma.Hyperparameters(a.num_items, 8).num_epochs(1).from_seed(0).build()
    m3.fit(a)
    m3._window_cache = None  # force re-extraction
    loss3 = m3.fit(b)
    assert abs(loss2 - loss3) < 1e-6


def test_fit_program_cache_respects_hyper_change():
    """Changing a non-shape hyperparameter between fits must not reuse the
    stale compiled program (regression)."""
    inter = _toy_interactions().to_compressed()
    m = (
        ewma.Hyperparameters(inter.num_items, 8)
        .learning_rate(0.1)
        .num_epochs(1)
        .from_seed(0)
        .build()
    )
    m.fit(inter)
    table_fast = m.item_embeddings.copy()
    # Fresh model, tiny lr: trajectory must differ even though shapes match.
    m2 = (
        ewma.Hyperparameters(inter.num_items, 8)
        .learning_rate(0.1)
        .num_epochs(1)
        .from_seed(0)
        .build()
    )
    m2.hyper.learning_rate(1e-6)
    m2.fit(inter)
    assert not np.allclose(m2.item_embeddings, table_fast)
    # and the same model refit after an lr change uses the new lr
    m.hyper.learning_rate(1e-6)
    before = m.item_embeddings.copy()
    m.fit(inter)
    assert np.allclose(m.item_embeddings, before, atol=1e-3)


def test_out_of_range_item_ids_raise():
    """OOB ids must raise a typed error, not silently clamp (the reference
    panics on out-of-bounds indexing)."""
    inter = _toy_interactions().to_compressed()
    model = ewma.Hyperparameters(inter.num_items, 8).num_epochs(1).from_seed(0).build()
    model.fit(inter)
    rep = model.user_representation([1, 2, 3])
    with pytest.raises(sbr.PredictionError):
        model.predict(rep, [inter.num_items + 5])
    with pytest.raises(sbr.PredictionError):
        model.user_representation([inter.num_items + 5])
    with pytest.raises(sbr.PredictionError):
        model.recommend([inter.num_items + 5], k=3)


def test_recommend_batch_matches_single():
    """recommend_batch == per-user recommend for every user (device top-k
    vs host argpartition; same scores, same exclusions)."""
    inter = _toy_interactions(num_users=30, num_items=40).to_compressed()
    model = (
        lstm.Hyperparameters(40, 8).embedding_dim(16).num_epochs(2)
        .batch_size(16).from_seed(3).build()
    )
    model.fit(inter)
    histories = [[1, 2, 3], [4, 5], [], [7, 8, 9, 10, 2]]
    batch = model.recommend_batch(histories, k=5)
    for h, got in zip(histories, batch):
        want = model.recommend(h, k=5)
        assert got == want, (h, got, want)
    # exclude_seen=False variant also agrees
    batch2 = model.recommend_batch(histories, k=5, exclude_seen=False)
    for h, got in zip(histories, batch2):
        assert got == model.recommend(h, k=5, exclude_seen=False)

def test_recommend_batch_chunked_matches_dense(monkeypatch):
    """The streamed chunked top-k (catalog slabs + running merge) must equal
    a dense full-catalog argsort, including the final chunk's overlap
    handling (num_items NOT divisible by the chunk) and seen-item masking
    across chunk boundaries (VERDICT r2 item 2)."""
    from sbr_rs_tpu.models.base import ImplicitSequenceModel

    num_items = 37  # 5 chunks of 8 with a 3-column overlap in the last
    inter = _toy_interactions(num_users=20, num_items=num_items).to_compressed()
    model = (
        lstm.Hyperparameters(num_items, 8).embedding_dim(16).num_epochs(2)
        .batch_size(16).from_seed(5).build()
    )
    model.fit(inter)
    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_ITEM_CHUNK", 8)
    ImplicitSequenceModel._TOPK_FN_CACHE.clear()  # drop dense-traced programs
    try:
        histories = [[1, 2, 3], [30, 35, 36], [], list(range(0, 37, 3))]
        got = model.recommend_batch(histories, k=6)
        for h, g in zip(histories, got):
            rep = model.user_representation(h)
            scores = np.array(model.predict(rep))
            if h:
                scores[np.asarray(h)] = -np.inf
            want = list(np.argsort(-scores, kind="stable")[:6])
            assert g == want, (h, g, want)
            assert not set(g) & set(h)
            assert len(set(g)) == 6  # overlap columns must not duplicate items
    finally:
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()

def test_recommend_batch_pallas_streamed_matches_dense(monkeypatch):
    """The FUSED-KERNEL streamed top-k (score+group-max in VMEM,
    ops/pallas_topk.py) must equal the dense full-catalog argsort, like the
    XLA streamed path it replaces on TPU — run here in interpret mode with
    a 2048-row chunk (the kernel's minimum row block)."""
    from jax.experimental.pallas import tpu as pltpu

    from sbr_rs_tpu.models.base import ImplicitSequenceModel

    num_items = 5000  # 3 chunks of 2048 with a clamped final chunk
    model = (
        lstm.Hyperparameters(num_items, 8).embedding_dim(16).num_epochs(1)
        .batch_size(16).from_seed(11).build()
    )
    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_ITEM_CHUNK", 2048)
    monkeypatch.setenv("SBR_PALLAS_TOPK", "1")
    ImplicitSequenceModel._TOPK_FN_CACHE.clear()
    try:
        histories = [[1, 2, 3], [4090, 4999], [], list(range(0, 5000, 400))]
        with pltpu.force_tpu_interpret_mode():
            got = model.recommend_batch(histories, k=6)
        for h, g in zip(histories, got):
            rep = model.user_representation(h)
            scores = np.array(model.predict(rep))
            if h:
                scores[np.asarray(h)] = -np.inf
            want = list(np.argsort(-scores, kind="stable")[:6])
            assert g == want, (h, g, want)
            assert not set(g) & set(h)
            assert len(set(g)) == 6
    finally:
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()


def test_recommend_batch_return_scores():
    """return_scores must hand back the same dot(user, emb) + bias values
    predict computes, aligned with the returned ids."""
    num_items = 30
    inter = _toy_interactions(num_users=10, num_items=num_items).to_compressed()
    model = (
        lstm.Hyperparameters(num_items, 8).embedding_dim(16).num_epochs(1)
        .batch_size(16).from_seed(2).build()
    )
    model.fit(inter)
    histories = [[1, 2, 3], [7]]
    ids, scores = model.recommend_batch(histories, k=4, return_scores=True)
    assert scores.shape == (2, 4)
    for h, row_ids, row_scores in zip(histories, ids, scores):
        rep = model.user_representation(h)
        want = np.asarray(model.predict(rep, row_ids))
        np.testing.assert_allclose(row_scores, want, rtol=1e-5)
        assert list(row_scores) == sorted(row_scores, reverse=True)
    assert model.recommend_batch([], k=4, return_scores=True)[0] == []


def test_streamed_topk_exact_under_adversarial_ties(monkeypatch):
    """Two-phase group-max selection with EXACT duplicate scores spanning
    group boundaries: returned VALUES must match the dense argsort's top-k
    values (ties at the k-th value may legitimately pick different ids)."""
    from sbr_rs_tpu.models.base import ImplicitSequenceModel

    num_items = 40
    inter = _toy_interactions(num_users=10, num_items=num_items).to_compressed()
    model = (
        lstm.Hyperparameters(num_items, 8).embedding_dim(16).num_epochs(1)
        .batch_size(16).from_seed(3).build()
    )
    model.fit(inter)
    # Force massive score ties: duplicate table rows across chunk/group
    # boundaries (chunk 8 below). Every duplicated row scores identically
    # for every user.
    tbl = np.array(model._params["item_table"])  # writable copy
    tbl[10:20] = tbl[0:10]
    tbl[25:30] = tbl[0:5]
    import jax.numpy as _jnp

    model._params["item_table"] = _jnp.asarray(tbl)
    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_ITEM_CHUNK", 8)
    ImplicitSequenceModel._TOPK_FN_CACHE.clear()
    try:
        histories = [[0], [5, 6], [39]]
        ids, scores = model.recommend_batch(
            histories, k=6, exclude_seen=False, return_scores=True
        )
        for h, row_ids, row_scores in zip(histories, ids, scores):
            rep = model.user_representation(h)
            dense = np.sort(np.asarray(model.predict(rep)))[::-1][:6]
            np.testing.assert_allclose(row_scores, dense, rtol=1e-5)
            assert len(set(row_ids)) == 6  # distinct ids even under ties
    finally:
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()


def test_streamed_topk_subgroup_refinement(monkeypatch):
    """The two-level selection (group maxima for the phase-1 merge, final
    units picked at SUBGROUP width so phase 2 gathers kk*sub rows) must
    stay value-exact against the dense argsort — including with massive
    duplicate-score ties spanning group/subgroup boundaries, and with
    seen-item exclusion."""
    from sbr_rs_tpu.models.base import ImplicitSequenceModel

    num_items = 40
    inter = _toy_interactions(num_users=10, num_items=num_items).to_compressed()
    model = (
        lstm.Hyperparameters(num_items, 8).embedding_dim(16).num_epochs(1)
        .batch_size(16).from_seed(3).build()
    )
    model.fit(inter)
    tbl = np.array(model._params["item_table"])
    tbl[10:20] = tbl[0:10]  # exact duplicate scores across boundaries
    import jax.numpy as _jnp

    model._params["item_table"] = _jnp.asarray(tbl)
    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_ITEM_CHUNK", 8)
    for sub_target in (2, 4):
        monkeypatch.setattr(
            ImplicitSequenceModel, "_SUBGROUP_TARGET", sub_target
        )
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()
        try:
            histories = [[0], [5, 6], [39], []]
            ids, scores = model.recommend_batch(
                histories, k=6, return_scores=True
            )
            for h, row_ids, row_scores in zip(histories, ids, scores):
                rep = model.user_representation(h)
                dense = np.array(model.predict(rep))  # writable copy
                if h:
                    dense[np.asarray(h)] = -np.inf
                want = np.sort(dense)[::-1][:6]
                np.testing.assert_allclose(row_scores, want, rtol=1e-5)
                assert len(set(row_ids)) == 6
                assert not set(row_ids) & set(h)
        finally:
            ImplicitSequenceModel._TOPK_FN_CACHE.clear()


def test_recommend_batch_running_merge_branch(monkeypatch):
    """The running per-chunk merge (taken when the all-groups maxima buffer
    exceeds _MERGE_BUFFER_BYTES) must equal the dense argsort too."""
    from sbr_rs_tpu.models.base import ImplicitSequenceModel

    num_items = 37
    inter = _toy_interactions(num_users=20, num_items=num_items).to_compressed()
    model = (
        lstm.Hyperparameters(num_items, 8).embedding_dim(16).num_epochs(2)
        .batch_size(16).from_seed(5).build()
    )
    model.fit(inter)
    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_ITEM_CHUNK", 8)
    monkeypatch.setattr(ImplicitSequenceModel, "_MERGE_BUFFER_BYTES", 0)
    ImplicitSequenceModel._TOPK_FN_CACHE.clear()
    try:
        histories = [[1, 2, 3], [30, 35, 36], [], list(range(0, 37, 3))]
        got = model.recommend_batch(histories, k=6)
        for h, g in zip(histories, got):
            rep = model.user_representation(h)
            scores = np.array(model.predict(rep))
            if h:
                scores[np.asarray(h)] = -np.inf
            want = list(np.argsort(-scores, kind="stable")[:6])
            assert g == want, (h, g, want)
    finally:
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()


def test_recommend_batch_ragged_chunk_pallas_running_merge(monkeypatch):
    """A serve chunk that is NOT a multiple of the kernel row block on the
    RUNNING-MERGE (mid-catalog chunked) path: Pallas pads the ragged final
    block with UNDEFINED rows whose global ids are still < n — the
    in-kernel local < c bound must mask them and the caller slices the pad
    groups off, so the kernel path still equals the dense argsort
    (advisor r4's failure mode, fixed at the root)."""
    from jax.experimental.pallas import tpu as pltpu

    from sbr_rs_tpu.models.base import ImplicitSequenceModel

    num_items = 7000
    model = (
        lstm.Hyperparameters(num_items, 8).embedding_dim(16).num_epochs(1)
        .batch_size(16).from_seed(3).build()
    )
    # 3000 is not a multiple of the 2048 row block → every chunk call is
    # a ragged mid-catalog call.
    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_ITEM_CHUNK", 3000)
    monkeypatch.setattr(ImplicitSequenceModel, "_MERGE_BUFFER_BYTES", 0)
    monkeypatch.setenv("SBR_PALLAS_TOPK", "1")
    ImplicitSequenceModel._TOPK_FN_CACHE.clear()
    try:
        histories = [[1, 2, 3], [6990, 6999], []]
        with pltpu.force_tpu_interpret_mode():
            got = model.recommend_batch(histories, k=6)
        for h, g in zip(histories, got):
            rep = model.user_representation(h)
            scores = np.array(model.predict(rep))
            if h:
                scores[np.asarray(h)] = -np.inf
            want = list(np.argsort(-scores, kind="stable")[:6])
            assert g == want, (h, g, want)
    finally:
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()


def test_recommend_batch_bigseen_and_approx_paths(monkeypatch):
    """The wide-seen fallback (S > _SERVE_MAX_POSTFILTER_SEEN: per-chunk
    scatter masking + full merge) must equal the dense reference; the
    approximate path must return valid unseen items with exact scores'
    ordering within its candidate set."""
    from sbr_rs_tpu.models.base import ImplicitSequenceModel

    num_items = 50
    inter = _toy_interactions(num_users=20, num_items=num_items).to_compressed()
    model = (
        lstm.Hyperparameters(num_items, 8).embedding_dim(16).num_epochs(2)
        .batch_size(16).from_seed(9).build()
    )
    model.fit(inter)
    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_ITEM_CHUNK", 8)
    monkeypatch.setattr(ImplicitSequenceModel, "_SERVE_MAX_POSTFILTER_SEEN", 4)
    ImplicitSequenceModel._TOPK_FN_CACHE.clear()
    try:
        # histories longer than the post-filter threshold force the
        # big-seen path
        histories = [list(range(0, 20)), list(range(5, 17)), [1, 2, 3, 4, 5, 6]]
        got = model.recommend_batch(histories, k=5)
        for h, g in zip(histories, got):
            rep = model.user_representation(h)
            scores = np.array(model.predict(rep))
            scores[np.asarray(h)] = -np.inf
            want = list(np.argsort(-scores, kind="stable")[:5])
            assert g == want, (h, g, want)

        # approximate path (short seen lists): all returned items are real,
        # unseen, and distinct
        short = [[1, 2], [10, 11, 12]]
        approx = model.recommend_batch(short, k=5, approximate=True)
        for h, g in zip(short, approx):
            assert len(g) == 5 and len(set(g)) == 5
            assert all(0 <= i < num_items for i in g)
            assert not set(g) & set(h)
    finally:
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()
