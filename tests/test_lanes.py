import numpy as np
import pytest

from fastqueeze_tpu.ops.lanes import aux_grids, from_grid, make_layout, to_grid


@pytest.mark.parametrize("seed,R,L", [(0, 100, 8), (1, 1000, 64),
                                      (2, 7, 16), (3, 1, 4)])
def test_grid_roundtrip(seed, R, L):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 150, size=R)
    flat = rng.integers(0, 256, size=int(counts.sum())).astype(np.uint8)
    layout = make_layout(counts, L)
    grid = to_grid(layout, flat)
    back = from_grid(layout, grid)
    np.testing.assert_array_equal(back, flat)


def test_layout_packs_contiguously():
    counts = np.array([3, 2, 4, 1, 5])
    layout = make_layout(counts, 2)
    # lane 0: reads 0,2,4 -> lengths 3,4,5; lane 1: reads 1,3 -> 2,1
    np.testing.assert_array_equal(layout.lane_len, [12, 3])
    np.testing.assert_array_equal(layout.read_start_t, [0, 0, 3, 2, 7])
    valid, aux = aux_grids(layout)
    assert valid[:12, 0].all() and not valid[12:, 0].any()
    assert valid[:3, 1].all() and not valid[3:, 1].any()
    starts0 = np.flatnonzero(aux["start"][:, 0])
    np.testing.assert_array_equal(starts0, [0, 3, 7])


def test_zero_length_reads():
    counts = np.array([0, 3, 0, 2])
    layout = make_layout(counts, 2)
    flat = np.arange(5, dtype=np.uint8)
    back = from_grid(layout, to_grid(layout, flat))
    np.testing.assert_array_equal(back, flat)
