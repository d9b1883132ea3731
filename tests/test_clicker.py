"""Host Clicker (scipy EDT) vs the fused on-device next-click kernel —
independent implementations must pick identical clicks."""
import numpy as np
import jax.numpy as jnp

from pvpuformer_tpu.inference.clicker import Clicker
from pvpuformer_tpu.ops.edt import next_click_from_error


def blob(seed, h=48, w=64):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[:h, :w]
    m = np.zeros((h, w), bool)
    for _ in range(3):
        cy, cx = r.integers(4, h - 4), r.integers(4, w - 4)
        rad = r.integers(3, 10)
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= rad ** 2
    return m


def test_device_click_matches_host_clicker():
    for seed in range(6):
        gt = blob(seed).astype(np.int32)
        pred = blob(seed + 100)
        clicker = Clicker(gt_mask=gt)

        not_clicked = np.ones_like(pred, bool)
        for step in range(4):
            ref = clicker._get_next_click(pred)
            gtb = gt == 1
            fn = gtb & ~pred
            fp = ~gtb & pred
            is_pos, y, x, _ = next_click_from_error(
                jnp.asarray(fn), jnp.asarray(fp), jnp.asarray(not_clicked))
            assert bool(is_pos) == ref.is_positive, (seed, step)
            assert (int(y), int(x)) == ref.coords, (seed, step)
            clicker.add_click(ref)
            not_clicked[ref.coords[0], ref.coords[1]] = False


def test_clicker_state_roundtrip():
    gt = blob(0).astype(np.int32)
    c = Clicker(gt_mask=gt)
    c.make_next_click(np.zeros_like(gt, bool))
    state = c.get_state()
    c.make_next_click(np.zeros_like(gt, bool))
    assert len(c) == 2
    c.set_state(state)
    assert len(c) == 1
