"""Native (C++) data backend: build, and equivalence with the numpy path."""

import os

import numpy as np
import pytest

from sbr_rs_tpu import _native
from sbr_rs_tpu import data as D


pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native backend unavailable (no g++?)"
)


def _random_interactions(n=5000, num_users=200, num_items=300, seed=0):
    rng = np.random.default_rng(seed)
    return D.Interactions.from_arrays(
        rng.integers(0, num_users, n),
        rng.integers(0, num_items, n),
        rng.integers(0, 10_000, n),
        num_users,
        num_items,
    )


def test_stable_order_matches_lexsort():
    inter = _random_interactions()
    native = _native.stable_order_by_user_ts(inter.user_ids, inter.timestamps)
    ref = np.lexsort((inter.timestamps, inter.user_ids))
    np.testing.assert_array_equal(native, ref)


def test_windows_match_numpy_path():
    inter = _random_interactions().to_compressed()
    for T in (4, 7, 16):
        got = _native.extract_padded_windows(
            inter.user_pointers, inter.item_ids, T, 3
        )
        want = D._extract_padded_windows_numpy(inter, T)
        np.testing.assert_array_equal(got[0], want.inputs)
        np.testing.assert_array_equal(got[1], want.targets)
        np.testing.assert_array_equal(got[2], want.mask)
        np.testing.assert_array_equal(got[3], want.lengths)


def test_csv_parse(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        "user_id,item_id,rating,timestamp\n"
        "1,2,5,100\n"
        "3,4,1,200\n"
        "10,20,3,300\n"
    )
    users, items, ts = _native.parse_interactions_csv(str(p))
    np.testing.assert_array_equal(users, [1, 3, 10])
    np.testing.assert_array_equal(items, [2, 4, 20])
    np.testing.assert_array_equal(ts, [100, 200, 300])


def test_csv_parse_matches_loadtxt_on_ml100k():
    path = "/root/reference/data.csv"
    if not os.path.exists(path):
        pytest.skip("ML-100K csv not present")
    users, items, ts = _native.parse_interactions_csv(path)
    raw = np.loadtxt(path, delimiter=",", skiprows=1, dtype=np.int64, usecols=(0, 1, 3))
    np.testing.assert_array_equal(users, raw[:, 0])
    np.testing.assert_array_equal(items, raw[:, 1])
    np.testing.assert_array_equal(ts, raw[:, 2])


def test_native_windows_when_t_below_min_len():
    """T < min_length must yield ZERO windows on both backends (regression:
    the native count pass admitted full-T chunks the fill pass rejected)."""
    inter = _random_interactions(n=50, num_users=5, num_items=10).to_compressed()
    got = _native.extract_padded_windows(inter.user_pointers, inter.item_ids, 2, 3)
    want = D._extract_padded_windows_numpy(inter, 2, 3)
    assert got[0].shape[0] == len(want) == 0


def test_native_packing_matches_numpy(monkeypatch):
    """Native first-fit-decreasing pack plan must produce the identical plan
    and packed arrays as the numpy implementation."""
    for seed, T in ((0, 8), (1, 16), (2, 5)):
        rng = np.random.default_rng(seed)
        inter = D.Interactions.from_arrays(
            rng.integers(0, 60, 4000),
            rng.integers(0, 80, 4000),
            rng.integers(0, 10_000, 4000),
            60,
            80,
        ).to_compressed()
        padded = D._extract_padded_windows_numpy(inter, T)
        got = D.pack_streams(padded, T)  # native plan (available() is True)

        # Force the numpy plan for the reference result.
        monkeypatch.setattr(_native, "available", lambda: False)
        want = D.pack_streams(padded, T)
        monkeypatch.undo()

        np.testing.assert_array_equal(got.stream, want.stream)
        np.testing.assert_array_equal(got.mask, want.mask)
        np.testing.assert_array_equal(got.starts, want.starts)
        np.testing.assert_array_equal(got.lengths, want.lengths)

        # And the raw plans agree bit-for-bit.
        sizes = np.where(padded.lengths >= 1, padded.lengths + 1, 0).astype(np.int32)
        nb, no, nm = _native.pack_plan(sizes, T + 1)
        pb, po, pm = D._pack_plan_numpy(sizes, T + 1)
        np.testing.assert_array_equal(nb, pb)
        np.testing.assert_array_equal(no, po)
        assert nm == pm


def test_native_packing_skips_zero_length():
    padded = D.pad_windows([np.array([1, 2, 3, 4, 5]), np.array([7])], 4)
    packed = D.pack_streams(padded, 4)  # native plan
    assert packed.num_examples == 4
    assert float(packed.starts.sum()) == 1.0


def test_csv_parse_rejects_short_rows(tmp_path):
    """Lines with fewer than 4 comma-separated fields must error, matching
    the numpy loadtxt fallback (which raises), not zero-fill (ADVICE r1)."""
    p = tmp_path / "short.csv"
    p.write_text("user_id,item_id,rating\n1,2,5\n3,4,1\n")
    with pytest.raises(IOError):
        _native.parse_interactions_csv(str(p))
