"""Data-layer tests, pinning the reference's invariants (SURVEY.md §4)."""

import numpy as np
import pytest

from sbr_rs_tpu import data as D


def _random_interactions(num_users=20, num_items=20, n=100, seed=42):
    rng = np.random.default_rng(seed)
    return D.Interactions(
        num_users,
        num_items,
        rng.integers(0, num_users, n),
        rng.integers(0, num_items, n),
        rng.integers(0, 50, n),
    )


def test_siphash24_reference_vectors():
    """SipHash-2-4 test vectors from the reference implementation
    (key = 000102..0f, message = first n bytes of 00 01 02 ...)."""
    k0 = 0x0706050403020100
    k1 = 0x0F0E0D0C0B0A0908
    # 8-byte message 00..07 as little-endian u64:
    msg = 0x0706050403020100
    expected = 0x93F5F5799A932462  # official vector for len=8
    out = D.siphash24(k0, k1, np.array([msg], dtype=np.uint64))
    assert int(out[0]) == expected


def test_compressed_round_trip_and_user_split():
    """Mirrors the reference's `to_compressed` test (`src/data.rs:587-627`):
    split + CSR round-trip preserves the interaction multiset."""
    interactions = _random_interactions()
    original = set(
        zip(interactions.user_ids, interactions.item_ids, interactions.timestamps)
    )

    rng = np.random.default_rng(42)
    train, test = D.user_based_split(interactions, rng, 0.5)
    train_rt = train.to_compressed().to_interactions()
    test_rt = test.to_compressed().to_interactions()

    assert len(train_rt) + len(test_rt) == len(interactions)
    recovered = set(
        zip(train_rt.user_ids, train_rt.item_ids, train_rt.timestamps)
    ) | set(zip(test_rt.user_ids, test_rt.item_ids, test_rt.timestamps))
    assert recovered <= original
    # Disjoint users:
    assert not (set(train.user_ids) & set(test.user_ids))


def test_user_split_deterministic_given_rng():
    interactions = _random_interactions()
    t1, s1 = D.user_based_split(interactions, np.random.default_rng(7), 0.3)
    t2, s2 = D.user_based_split(interactions, np.random.default_rng(7), 0.3)
    assert np.array_equal(t1.user_ids, t2.user_ids)
    assert np.array_equal(s1.item_ids, s2.item_ids)


def test_train_test_split_fractions():
    interactions = _random_interactions(n=1000)
    train, test = D.train_test_split(interactions, np.random.default_rng(3), 0.2)
    assert len(test) == 200
    assert len(train) == 800


def test_chunk_iterator_first_chunk_smallest():
    """Pins the first-chunk-smallest invariant (`src/data.rs:629-662`):
    5 items with chunk_size=3 -> [0,1], [2,3,4]."""
    inter = D.Interactions.from_arrays(
        np.zeros(5, np.int64), np.arange(5), np.arange(5)
    )
    compressed = inter.to_compressed()
    chunks = [list(c[0]) for u in compressed.iter_users() for c in u.chunks(3)]
    assert chunks == [[0, 1], [2, 3, 4]]


def test_compressed_sorted_by_user_then_time():
    inter = D.Interactions.from_arrays(
        np.array([1, 0, 1, 0]),
        np.array([10, 11, 12, 13]),
        np.array([5, 9, 1, 2]),
    )
    c = inter.to_compressed()
    u0 = c.get_user(0)
    u1 = c.get_user(1)
    assert list(u0.item_ids) == [13, 11]  # timestamps 2, 9
    assert list(u1.item_ids) == [12, 10]  # timestamps 1, 5
    assert c.get_user(5) is None


def test_extract_windows_filters_short():
    """Windows of length <= 2 are dropped (`src/models/sequence_model.rs:81`)."""
    # user 0: 5 items, chunk 3 -> first chunk [0,1] (len 2, dropped), [2,3,4] kept.
    inter = D.Interactions.from_arrays(
        np.zeros(5, np.int64), np.arange(5), np.arange(5)
    )
    windows = D.extract_windows(inter.to_compressed(), 3)
    assert [list(w) for w in windows] == [[2, 3, 4]]


def test_pad_windows_masks_and_counts():
    windows = [np.array([1, 2, 3]), np.array([4, 5, 6, 7])]
    padded = D.pad_windows(windows, 4)
    assert padded.inputs.shape == (2, 4)
    # window [1,2,3]: inputs [1,2], targets [2,3], 2 supervised steps
    assert list(padded.inputs[0]) == [1, 2, 0, 0]
    assert list(padded.targets[0]) == [2, 3, 0, 0]
    assert list(padded.mask[0]) == [1, 1, 0, 0]
    assert list(padded.inputs[1]) == [4, 5, 6, 0]
    assert padded.num_examples == 2 + 3


def test_extract_padded_windows_matches_loop_version():
    """Vectorized windowing must equal extract_windows + pad_windows for
    arbitrary history lengths and chunk sizes."""
    rng = np.random.default_rng(5)
    for trial in range(5):
        num_users = int(rng.integers(1, 30))
        lengths = rng.integers(0, 40, num_users)
        users = np.repeat(np.arange(num_users), lengths)
        n = len(users)
        inter = D.Interactions.from_arrays(
            users, rng.integers(0, 50, n), np.arange(n), num_users, 50
        ).to_compressed()
        for T in (3, 5, 16):
            slow = D.pad_windows(D.extract_windows(inter, T), T)
            fast = D.extract_padded_windows(inter, T)
            np.testing.assert_array_equal(fast.inputs, slow.inputs)
            np.testing.assert_array_equal(fast.targets, slow.targets)
            np.testing.assert_array_equal(fast.mask, slow.mask)
            np.testing.assert_array_equal(fast.lengths, slow.lengths)


def test_triplet_minibatches():
    inter = _random_interactions(n=10)
    trip = inter.to_triplet()
    batches = list(trip.iter_minibatch(3))
    assert len(batches) == 3  # trailing partial batch dropped (ref behavior)
    parts = trip.iter_minibatch_partitioned(2, 2)
    total = sum(len(b[0]) for it in parts for b in it)
    # two partitions of 5 rows, minibatch 2, partials dropped per partition
    assert total == 8


def test_shuffle_preserves_rows():
    inter = _random_interactions(n=50)
    before = set(zip(inter.user_ids, inter.item_ids, inter.timestamps))
    inter.shuffle(np.random.default_rng(0))
    after = set(zip(inter.user_ids, inter.item_ids, inter.timestamps))
    assert before == after


def test_interaction_event_api():
    inter = D.Interactions.from_arrays(
        np.array([1, 2]), np.array([3, 4]), np.array([5, 6])
    )
    events = list(inter)
    assert events[0] == D.Interaction(1, 3, 5)
    assert inter[1] == D.Interaction(2, 4, 6)
    assert events[0].weight() == 1.0


def test_dataset_loaders():
    from sbr_rs_tpu import datasets

    dummy = datasets.dummy_interactions(10, 5)
    assert len(dummy) == 50
    assert dummy.num_items == 1005  # items are 1000..1004, shape is max+1
    first_user = [e.item_id for e in list(dummy)[:5]]
    assert first_user == [1000, 1001, 1002, 1003, 1004]

    syn = datasets.synthetic_interactions(20, 100, 7, rng=0)
    assert len(syn) == 140
    assert syn.num_items == 100


def test_goodbooks_loader(tmp_path):
    from sbr_rs_tpu import datasets

    p = tmp_path / "ratings.csv"
    p.write_text(
        "user_id,book_id,rating\n"
        "2,10,5\n"
        "1,20,4\n"
        "2,30,3\n"
        "1,40,5\n"
    )
    inter = datasets.load_goodbooks(str(p))
    # sorted stably by user; timestamps are original row positions
    assert [e.user_id for e in inter] == [1, 1, 2, 2]
    assert [e.item_id for e in inter] == [20, 40, 10, 30]
    assert [e.timestamp for e in inter] == [1, 3, 0, 2]


def test_container_save_load_round_trip(tmp_path):
    """All three containers persist and restore exactly (the reference
    derives Serialize/Deserialize on each, src/data.rs:91,227,435)."""
    rng = np.random.default_rng(5)
    inter = D.Interactions.from_arrays(
        rng.integers(0, 30, 500), rng.integers(0, 40, 500),
        rng.integers(0, 1000, 500), 30, 40,
    )
    p = tmp_path / "inter.npz"
    inter.save(str(p))
    back = D.Interactions.load(str(p))
    assert (back.num_users, back.num_items) == (30, 40)
    np.testing.assert_array_equal(back.user_ids, inter.user_ids)
    np.testing.assert_array_equal(back.item_ids, inter.item_ids)
    np.testing.assert_array_equal(back.timestamps, inter.timestamps)

    comp = inter.to_compressed()
    comp.save(str(tmp_path / "comp.npz"))
    cback = D.CompressedInteractions.load(str(tmp_path / "comp.npz"))
    np.testing.assert_array_equal(cback.user_pointers, comp.user_pointers)
    np.testing.assert_array_equal(cback.item_ids, comp.item_ids)
    np.testing.assert_array_equal(cback.timestamps, comp.timestamps)
    assert (cback.num_users, cback.num_items) == (comp.num_users, comp.num_items)

    trip = inter.to_triplet()
    trip.save(str(tmp_path / "trip.npz"))
    tback = D.TripletInteractions.load(str(tmp_path / "trip.npz"))
    np.testing.assert_array_equal(tback.user_ids, trip.user_ids)
    np.testing.assert_array_equal(tback.item_ids, trip.item_ids)
    np.testing.assert_array_equal(tback.timestamps, trip.timestamps)


def test_container_load_wrong_kind_raises(tmp_path):
    rng = np.random.default_rng(5)
    inter = D.Interactions.from_arrays(
        rng.integers(0, 5, 20), rng.integers(0, 5, 20), np.arange(20), 5, 5
    )
    p = tmp_path / "x.npz"
    inter.save(str(p))
    with pytest.raises(ValueError, match="interactions"):
        D.CompressedInteractions.load(str(p))


def test_interactions_data_returns_events():
    inter = D.Interactions.from_arrays([1, 0], [2, 3], [10, 20], 2, 4)
    events = inter.data()
    assert events == [D.Interaction(1, 2, 10), D.Interaction(0, 3, 20)]
