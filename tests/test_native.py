"""C++ dist-maps kernel vs the pure-python BFS oracle."""
import numpy as np
import pytest

from pvpuformer_tpu.native import (get_dist_maps, get_dist_maps_numpy, _load)


def test_native_builds():
    assert _load() is not None, "g++ build of the native kernel failed"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python_bfs(seed):
    r = np.random.default_rng(seed)
    n = 6
    pts = np.full((2 * n, 3), -1.0, np.float32)
    for i in r.choice(2 * n, size=5, replace=False):
        pts[i, :2] = (r.integers(0, 40), r.integers(0, 52))
    ours = get_dist_maps(pts, 40, 52, norm_delimiter=2.0)
    ref = get_dist_maps_numpy(pts, 40, 52, 2.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_no_points_gives_far_field():
    pts = np.full((4, 3), -1.0, np.float32)
    out = get_dist_maps(pts, 8, 8)
    assert (out == 1e6).all()


def test_zero_at_click_separate_layers():
    pts = np.full((4, 3), -1.0, np.float32)
    pts[0, :2] = (2, 3)     # positive -> layer 0
    pts[3, :2] = (5, 6)     # negative -> layer 1
    out = get_dist_maps(pts, 10, 10)
    assert out[0, 2, 3] == 0.0 and out[1, 5, 6] == 0.0
    assert out[1, 2, 3] > 0 and out[0, 5, 6] > 0
