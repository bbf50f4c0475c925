"""Data pipeline tests: collators and FFD multipack packing."""

import numpy as np
import pytest

from usdm_tpu.data.collators import IGNORE_INDEX, pack_collate, sft_collate
from usdm_tpu.data.packing import MultipackSampler, _allocate_np, _ffd_check_np, _load_native


def test_pack_collate_positions_restart_at_bos():
    bos = 1
    row = [bos, 5, 6, bos, 7, 8, 9, bos, 10]
    out = pack_collate([row], pad_id=0, bos_id=bos)
    np.testing.assert_array_equal(out["positions"][0], [0, 1, 2, 0, 1, 2, 3, 0, 1])
    np.testing.assert_array_equal(out["segment_ids"][0], [0, 0, 0, 1, 1, 1, 1, 2, 2])
    np.testing.assert_array_equal(out["labels"][0], row)


def test_pack_collate_padding():
    bos = 1
    out = pack_collate([[bos, 2, 3], [bos, 2, 3, 4, 5]], pad_id=99, bos_id=bos)
    assert out["input_ids"].shape == (2, 5)
    assert out["input_ids"][0, 3] == 99
    assert out["labels"][0, 3] == IGNORE_INDEX
    assert out["segment_ids"][0, 3] == -1
    assert out["positions"][0, 3] == 1  # reference pads positions with 1


def test_pack_collate_no_leading_bos():
    out = pack_collate([[7, 8, 1, 9]], pad_id=0, bos_id=1)
    np.testing.assert_array_equal(out["positions"][0], [0, 1, 0, 1])
    np.testing.assert_array_equal(out["segment_ids"][0], [0, 0, 1, 1])


def test_sft_collate():
    out = sft_collate([([1, 2, 3], [-100, 2, 3]), ([1, 4], [-100, 4])], pad_id=9)
    np.testing.assert_array_equal(out["input_ids"], [[1, 2, 3], [1, 4, 9]])
    np.testing.assert_array_equal(out["labels"], [[-100, 2, 3], [-100, 4, -100]])
    np.testing.assert_array_equal(out["segment_ids"][1], [0, 0, -1])


def test_ffd_check_basics():
    assert _ffd_check_np(np.array([4, 4, 4, 4]), 8, 2)
    assert not _ffd_check_np(np.array([5, 5, 5, 5]), 8, 2)
    assert _ffd_check_np(np.array([8, 8]), 8, 2)


def _validate_batches(lengths, batches_by_rank, c, n_ranks):
    # every batch fits; a given step uses disjoint indices across ranks
    n_steps = min(len(b) for b in batches_by_rank)
    for r, batches in enumerate(batches_by_rank):
        for batch in batches:
            assert lengths[batch].sum() <= c, "bin overflow"
    for step in range(n_steps):
        seen = set()
        for r in range(n_ranks):
            idx = set(batches_by_rank[r][step].tolist())
            assert not (seen & idx), "index assigned to two ranks"
            seen |= idx


@pytest.mark.parametrize("use_native", [False, True])
def test_multipack_sampler(use_native, rng):
    if use_native and _load_native() is None:
        pytest.skip("native lib not built")
    lengths = rng.integers(100, 2000, size=400)
    c = 4096
    n_ranks = 4
    per_rank = []
    samplers = []
    for r in range(n_ranks):
        s = MultipackSampler(c, lengths, num_replicas=n_ranks, rank=r, seed=7,
                             use_native=use_native)
        per_rank.append(s.generate_batches(set_stats=True))
        samplers.append(s)
    _validate_batches(lengths, per_rank, c, n_ranks)
    # all ranks see the same number of batches
    assert len({len(b) for b in per_rank}) == 1
    # high packing efficiency on this distribution
    assert samplers[0].efficiency() > 0.9


def test_native_matches_numpy(rng):
    if _load_native() is None:
        pytest.skip("native lib not built")
    lengths = rng.integers(50, 1500, size=300)
    for rank in (0, 2):
        a = MultipackSampler(2048, lengths, 3, rank, seed=1, use_native=True).generate_batches()
        b = MultipackSampler(2048, lengths, 3, rank, seed=1, use_native=False).generate_batches()
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.sort(x), np.sort(y))
