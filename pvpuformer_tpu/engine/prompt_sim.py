"""On-device training-time prompt simulation — batched, fixed shapes, jittable.

Re-derives the reference's host-side numpy/cv2 prompt synthesis
(`isegm/engine/trainer.py:615-768,1061-1131,1175-1190`) so the whole iterloss
round loop stays inside one XLA program:

  * `next_clicks`      = get_next_points / get_next_points_and_mask
    (trainer.py:615-703): per sample, EDT over the FN/FP error masks, a
    uniform random click inside the `dist > max/2` region, written to the
    first free point slot; the per-slot error-mask label (`ed_mask_label`)
    for P2CL gets the FN (or FP) mask at that slot.
  * `synth_boxes`      = cal_box (trainer.py:1061-1131): bbox of the dominant
    error region (largest connected component, merged with components
    covering >10% of the error area — max_connected_regions semantics,
    trainer.py:1175-1190), with +/-`set_offset` random jitter; or the GT bbox
    when `as_allmask`.
  * `connected_regions_mask` = max_connected_regions on device via iterative
    label propagation (3x3 max-pool + segmented row/column max-scans).

Documented deviations from the reference (training-data randomness only):
  * the EDT here is exact; trainer.py:628-629 uses cv2's 5x5 chamfer
    approximation (the eval-path clicker uses the exact transform, which we
    match exactly — see ops/edt.py);
  * max_connected_regions' in-loop relabel-to-running-max bug (a merged
    region can later be zeroed when a bigger component appears,
    trainer.py:1183-1188) is not replicated: we keep the union of the largest
    component and every component covering >10% of the error area.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.edt import squared_edt_pair


# ---------------------------------------------------------------------------
# connected components (per sample)
# ---------------------------------------------------------------------------

def _segmented_axis_max(lab: jnp.ndarray, mask: jnp.ndarray,
                        axis: int) -> jnp.ndarray:
    """Max label within each contiguous True-run of `mask` along `axis`."""
    reset = ~mask

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.maximum(av, bv)), ar | br

    fwd, _ = jax.lax.associative_scan(combine, (lab, reset), axis=axis)
    bwd, _ = jax.lax.associative_scan(combine, (lab, reset), axis=axis,
                                      reverse=True)
    return jnp.where(mask, jnp.maximum(fwd, bwd), 0)


def _maxpool3(lab: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(lab, jnp.iinfo(lab.dtype).min, jax.lax.max,
                                 (3, 3), (1, 1), "SAME")


def cc_labels(mask: jnp.ndarray, iters: int = 8,
              impl: str | None = None) -> jnp.ndarray:
    """8-connected component labels of (H, W) bool mask; 0 = background,
    components share the max flat-index + 1 of their pixels.

    `iters` bounds the propagation rounds (one round fully floods every
    straight row/column run, so `iters` is the number of direction
    reversals a component snake can have — 8 covers anything an error
    mask produces). impl: "xla" iterates to convergence on device
    (typical blobs settle in 2-3 rounds; the while_loop exits early
    instead of paying all 8), "pallas" runs the fixed-round kernel with
    every round in VMEM (ops/cc_pallas.py; bit-identical labels,
    ~25x faster at b8 448^2 on v5e — 1.3 ms vs 33 ms), "auto"
    (default) picks pallas on the TPU backend and xla elsewhere
    (Mosaic interpret mode on CPU is correct but slow)."""
    impl = impl or _CC_DEFAULT_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from ..ops.cc_pallas import cc_labels_pallas
        return cc_labels_pallas(mask[None], iters=iters,
                                interpret=jax.default_backend() != "tpu")[0]

    h, w = mask.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    lab = jnp.where(mask, idx, 0)

    def round_(lab):
        lab = jnp.where(mask, _maxpool3(lab), 0)
        lab = _segmented_axis_max(lab, mask, axis=1)
        lab = _segmented_axis_max(lab, mask, axis=0)
        return lab

    def cond(state):
        i, lab, done = state
        return (i < iters) & ~done

    def body(state):
        i, lab, _ = state
        nxt = round_(lab)
        return i + 1, nxt, jnp.all(nxt == lab)

    _, lab, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), lab,
                                                jnp.bool_(False)))
    return lab


_CC_DEFAULT_IMPL = "auto"


def set_cc_default_impl(impl: str) -> None:
    """Select the cc_labels implementation globally ("auto" / "xla" /
    "pallas"); affects programs traced after the call."""
    global _CC_DEFAULT_IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    _CC_DEFAULT_IMPL = impl


def _scatter_keep_one(mask: jnp.ndarray, lab: jnp.ndarray,
                      keep_frac: float) -> jnp.ndarray:
    """Reference formulation: size histogram by scatter-add into H*W+1
    label bins, `sizes[lab]` gather, keep = largest | > keep_frac."""
    h, w = mask.shape
    total = jnp.sum(mask).astype(jnp.float32)
    sizes = jnp.zeros((h * w + 1,), jnp.int32).at[lab.reshape(-1)].add(
        mask.reshape(-1).astype(jnp.int32))
    sizes = sizes.at[0].set(0)
    largest = jnp.argmax(sizes)                # smallest label among ties
    comp_size = sizes[lab].astype(jnp.float32)
    return mask & ((lab == largest) | (comp_size > keep_frac * total))


def connected_regions_mask_batch(masks: jnp.ndarray, keep_frac: float = 0.1,
                                 iters: int = 8, impl: str | None = None,
                                 compact_cap: int = 256) -> jnp.ndarray:
    """Batched max_connected_regions (trainer.py:1175-1190): per sample, the
    largest 8-connected component unioned with every component covering
    > keep_frac of the foreground. (B, H, W) bool -> (B, H, W) bool.

    * "xla": per-sample scatter-add size histogram + `sizes[lab]` gather —
      the reference formulation.
    * "pallas" ("auto" on TPU): scatter/gather-free compact-rank scheme.
      A component's label is its representative pixel's flat index + 1
      (the rep is where `lab == own index`). Reps are ranked 1..K in
      row-major order (a per-sample cumsum, order-preserving in label),
      the rank is flooded over each component with the VMEM propagation
      kernel (ops/cc_pallas.component_max_pallas), and both the size
      histogram and the final keep decision become dense compare-reduces
      against `arange(compact_cap)` — no scatter, no gather. Exact while
      every sample has <= compact_cap components; a `lax.cond` falls back
      to the scatter path otherwise. The predicate is the BATCH max, so
      the cond stays scalar (a vmapped per-sample cond would lower to
      select and execute both branches). Rank order == label order, so
      the largest-component tie-break (first max = smallest label) is
      identical in both branches.

    impl None defers to the cc_labels default ("auto": pallas on TPU)."""
    b, h, w = masks.shape
    impl = impl or _CC_DEFAULT_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    def scatter_batch(labs):
        return jax.vmap(lambda m, l: _scatter_keep_one(m, l, keep_frac)
                        )(masks, labs)

    if impl != "pallas":
        labs = jax.vmap(lambda m: cc_labels(m, iters, impl=impl))(masks)
        return scatter_batch(labs)

    from ..ops.cc_pallas import cc_labels_pallas, component_max_pallas
    interp = jax.default_backend() != "tpu"
    labs = cc_labels_pallas(masks, iters=iters, interpret=interp)
    idx = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    rep = masks & (labs == idx[None])
    n_max = jnp.max(jnp.sum(rep.astype(jnp.int32), axis=(1, 2)))

    def compact_batch():
        rank = jnp.cumsum(rep.reshape(b, -1).astype(jnp.int32),
                          axis=-1).reshape(b, h, w)
        seed = jnp.where(rep, rank, 0)
        rank_img = component_max_pallas(masks, seed, iters=iters,
                                        interpret=interp)      # (B, H, W)
        ids = jnp.arange(1, compact_cap + 1, dtype=jnp.int32)
        sizes = jnp.sum((rank_img[..., None] == ids) & masks[..., None],
                        axis=(1, 2), dtype=jnp.int32)          # (B, cap)
        largest = jnp.argmax(sizes, axis=-1).astype(jnp.int32) + 1
        total = jnp.sum(masks, axis=(1, 2)).astype(jnp.float32)
        keepk = (ids[None] == largest[:, None]) | \
            (sizes.astype(jnp.float32) > keep_frac * total[:, None])
        keep = jnp.any((rank_img[..., None] == ids[None, None, None]) &
                       keepk[:, None, None, :], axis=-1)
        return masks & keep

    return jax.lax.cond(n_max <= compact_cap,
                        compact_batch, lambda: scatter_batch(labs))


def connected_regions_mask(mask: jnp.ndarray, keep_frac: float = 0.1,
                           iters: int = 8,
                           impl: str | None = None,
                           compact_cap: int = 256) -> jnp.ndarray:
    """Single-mask convenience wrapper over connected_regions_mask_batch
    ((H, W) bool -> (H, W) bool). NB under jax.vmap this wrapper still
    works but degrades: the fallback cond's predicate becomes batched and
    lowers to select (both branches execute) — batch callers should use
    connected_regions_mask_batch directly."""
    return connected_regions_mask_batch(mask[None], keep_frac, iters, impl,
                                        compact_cap)[0]


# ---------------------------------------------------------------------------
# next click (per sample, vmapped)
# ---------------------------------------------------------------------------

def _first_free_slot(orders: jnp.ndarray, fallback: int) -> jnp.ndarray:
    """First index with order < 0, else `fallback` (trainer.py:641-652)."""
    free = orders < 0
    return jnp.where(jnp.any(free), jnp.argmax(free), fallback).astype(jnp.int32)


class ClickInfo(NamedTuple):
    has_click: jnp.ndarray    # (B,) bool
    is_positive: jnp.ndarray  # (B,) bool
    y: jnp.ndarray            # (B,) int32
    x: jnp.ndarray            # (B,) int32
    slot: jnp.ndarray         # (B,) int32
    fn_mask: jnp.ndarray      # (B, H, W) bool
    fp_mask: jnp.ndarray      # (B, H, W) bool


def _next_click_one(pred: jnp.ndarray, gt: jnp.ndarray, orders: jnp.ndarray,
                    key: jax.Array, pred_thresh: float, n: int,
                    deterministic: bool = False):
    """pred/gt: (H, W); orders: (2N,). Returns click fields.

    deterministic=True picks the FIRST inner-region pixel in row-major
    order instead of a uniform sample — the reference's
    `indices[np.random.randint(0, len(indices))]` (trainer.py:639,747)
    with the draw pinned to 0; used by the prompt-protocol parity
    certification (tests/test_reference_direct.py)."""
    gtm = gt > 0.5
    fn = gtm & (pred < pred_thresh)
    fp = (~gtm) & (pred > pred_thresh)

    # chunk=None: the unchunked min-plus is 6.6x faster at training batch
    # shapes (the chunked lax.map serializes); the chunked default only wins
    # inside the eval click-step program (ops/edt.squared_edt docstring).
    d_fn, d_fp = squared_edt_pair(fn, fp, chunk=None)
    fn_max = jnp.max(d_fn)
    fp_max = jnp.max(d_fp)
    is_positive = fn_max > fp_max
    d = jnp.where(is_positive, d_fn, d_fp)
    # linear-distance threshold dt > max/2 <=> squared > max^2/4
    inner = d > jnp.maximum(fn_max, fp_max) / 4.0
    has_click = jnp.any(inner)

    if deterministic:
        flat = jnp.argmax(inner.reshape(-1))
    else:
        g = jax.random.gumbel(key, d.shape)
        score = jnp.where(inner, g, -jnp.inf)
        flat = jnp.argmax(score.reshape(-1))
    w = pred.shape[1]
    y = (flat // w).astype(jnp.int32)
    x = (flat % w).astype(jnp.int32)

    slot_pos = _first_free_slot(orders[:n], n - 1)
    slot_neg = _first_free_slot(orders[n:], n - 1) + n
    slot = jnp.where(is_positive, slot_pos, slot_neg)
    return has_click, is_positive, y, x, slot, fn, fp


def next_clicks(pred: jnp.ndarray, gt: jnp.ndarray, points: jnp.ndarray,
                key: jax.Array, pred_thresh: float = 0.49,
                deterministic: bool = False
                ) -> Tuple[jnp.ndarray, ClickInfo]:
    """Batched get_next_points (trainer.py:615-654).

    pred: (B, H, W) probabilities; gt: (B, H, W); points: (B, 2N, 3).
    Returns (updated points, ClickInfo for the ed-mask update)."""
    b, twon, _ = points.shape
    n = twon // 2
    keys = jax.random.split(key, b)
    has, pos, ys, xs, slots, fns, fps = jax.vmap(
        lambda p, g, o, k: _next_click_one(p, g, o, k, pred_thresh, n,
                                           deterministic)
    )(pred, gt, points[:, :, 2], keys)

    order = jnp.maximum(jnp.max(points[:, :, 2], axis=1), 0.0) + 1.0
    row = jnp.stack([ys.astype(jnp.float32), xs.astype(jnp.float32), order],
                    axis=-1)                                   # (B, 3)
    bidx = jnp.arange(b)
    new_rows = jnp.where(has[:, None], row, points[bidx, slots])
    points = points.at[bidx, slots].set(new_rows)
    return points, ClickInfo(has, pos, ys, xs, slots, fns, fps)


def update_ed_mask(ed_mask: jnp.ndarray, info: ClickInfo) -> jnp.ndarray:
    """ed_mask_label[b, slot] = fn (positive) / fp (negative) for samples
    that produced a click (trainer.py:686-702). ed_mask: (B, H, W, 2N) bool."""
    err = jnp.where(info.is_positive[:, None, None], info.fn_mask,
                    info.fp_mask)                              # (B, H, W)
    onehot = jax.nn.one_hot(info.slot, ed_mask.shape[-1], dtype=jnp.bool_)
    sel = onehot[:, None, None, :] & info.has_click[:, None, None, None]
    return jnp.where(sel, err[..., None], ed_mask)


# ---------------------------------------------------------------------------
# box synthesis (cal_box, trainer.py:1061-1131)
# ---------------------------------------------------------------------------

def _bbox(mask: jnp.ndarray):
    """(H, W) bool -> (y0, y1, x0, x1) int32 of the True region."""
    h, w = mask.shape
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    y0 = jnp.argmax(rows).astype(jnp.int32)
    y1 = (h - 1 - jnp.argmax(rows[::-1])).astype(jnp.int32)
    x0 = jnp.argmax(cols).astype(jnp.int32)
    x1 = (w - 1 - jnp.argmax(cols[::-1])).astype(jnp.int32)
    return y0, y1, x0, x1


def _synth_box_one(mask: jnp.ndarray, loc: jnp.ndarray, key: jax.Array,
                   jitter: bool, set_offset: int,
                   h: int, w: int) -> jnp.ndarray:
    """Bbox + jitter of a precomputed region mask; the connected-component
    selection runs batched in synth_boxes (connected_regions_mask_batch)."""
    nonempty = jnp.any(mask)
    y0, y1, x0, x1 = _bbox(mask)

    if jitter:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        off = jax.random.randint(k1, (), -set_offset, 1)
        bx0 = jnp.minimum(jnp.maximum(x0 + off, 0), w - set_offset)
        off = jax.random.randint(k2, (), 0, set_offset + 1)
        bx1 = jnp.maximum(jnp.minimum(x1 + off, w), bx0 + set_offset)
        off = jax.random.randint(k3, (), -set_offset, 1)
        by0 = jnp.minimum(jnp.maximum(y0 + off, 0), h - set_offset)
        off = jax.random.randint(k4, (), 0, set_offset + 1)
        by1 = jnp.maximum(jnp.minimum(y1 + off, h), by0 + set_offset)
        y0, y1, x0, x1 = by0, by1, bx0, bx1

    xc = (x0 + x1) // 2
    yc = (y0 + y1) // 2
    bw = x1 - x0
    bh = y1 - y0
    ok = nonempty & (xc >= 1) & (yc >= 1) & (bw >= 1) & (bh >= 1)
    box = jnp.stack([xc, yc, bw, bh, loc]).astype(jnp.int32)
    return jnp.where(ok, box, jnp.zeros((5,), jnp.int32))


def synth_boxes(gt: jnp.ndarray, fn: jnp.ndarray, fp: jnp.ndarray,
                points: jnp.ndarray, key: jax.Array,
                as_allmask: bool = False, jitter: bool = True,
                set_offset: int = 10, n_dyn=None) -> jnp.ndarray:
    """Batched cal_box. gt/fn/fp: (B, H, W); points: (B, 2N, 3).
    Returns (B, 5) int32 [x_center, y_center, width, height, slot].

    `n_dyn` (traced scalar, default = the static half size N) is the
    reference's per-click half capacity (base.py:199-202): slot selection
    searches only the first n_dyn slots of a half and the positive hardcode
    / fallbacks become n_dyn - 1 — needed when the caller's points buffer is
    wider than the reference's dynamic tensor (the eval predictor). The
    resulting slot index still refers to OUR layout (negatives offset by N),
    which coincides with the reference's index after its end-padding."""
    b, twon, _ = points.shape
    n = twon // 2
    cap = jnp.asarray(n if n_dyn is None else n_dyn, jnp.int32)
    h, w = gt.shape[1], gt.shape[2]
    keys = jax.random.split(key, b)
    orders = points[:, :, 2]

    def first_free(half_orders):
        free = (half_orders < 0) & (jnp.arange(n) < cap)
        return jnp.where(jnp.any(free), jnp.argmax(free),
                         cap - 1).astype(jnp.int32)

    if as_allmask:
        masks = gt > 0.5
        locs = jax.vmap(lambda o: first_free(o[:n]))(orders)
    else:
        is_positive = jnp.sum(fn, axis=(1, 2)) > jnp.sum(fp, axis=(1, 2))
        err = jnp.where(is_positive[:, None, None], fn, fp)
        masks = connected_regions_mask_batch(err)
        loc_pos = cap - 1                 # reference hardcodes this (1087)
        loc_neg = jax.vmap(lambda o: first_free(o[n:]))(orders) + n
        locs = jnp.where(is_positive, loc_pos, loc_neg)
    return jax.vmap(
        lambda m, l, k: _synth_box_one(m, l, k, jitter, set_offset, h, w)
    )(masks, locs, keys)


# ---------------------------------------------------------------------------
# scribble synthesis on device (cal_scribble, trainer.py:1192-1243)
# ---------------------------------------------------------------------------

def _synth_scribble_one(mask: jnp.ndarray, key: jax.Array, num_ctrl: int,
                        num_samples: int, bernstein: jnp.ndarray):
    """One on-device scribble draw from a precomputed region mask (the
    connected-component selection runs batched in synth_scribbles).

    Matches cal_scribble's spec — control points sampled row-wise inside the
    largest connected region, a Bezier through them, samples clipped to the
    region bbox, output (col, row) + rect (col_c, row_c, col_ext, row_ext).
    Fixed-shape deviations (documented; the reference path is host numpy with
    data-dependent sizes): always `num_ctrl` control rows (reference draws
    randint(3,10)), rows with no mask pixels reuse the previous valid point
    (reference skips them), and the curve is always a Bezier (the reference
    coin-flips to a B-spline, trainer.py:1227)."""
    nonempty = jnp.any(mask)
    y0, y1, x0, x1 = _bbox(mask)          # rows y, cols x

    h, w = mask.shape
    krow, kcol = jax.random.split(key)
    # control rows spread over the row extent with jitter inside each band
    extent = (y1 - y0).astype(jnp.float32)
    band = extent / num_ctrl
    u = jax.random.uniform(krow, (num_ctrl,))
    rows = (y0.astype(jnp.float32)
            + band * (jnp.arange(num_ctrl, dtype=jnp.float32) + u))
    rows = jnp.clip(rows.astype(jnp.int32), 0, h - 1)

    # per control row: uniform random column among mask pixels of that row
    row_masks = mask[rows]                                   # (K, W)
    g = jax.random.gumbel(kcol, row_masks.shape)
    score = jnp.where(row_masks, g, -jnp.inf)
    cols = jnp.argmax(score, axis=1).astype(jnp.int32)       # (K,)
    has = jnp.any(row_masks, axis=1)
    # empty rows -> carry the previous valid point (prefix propagation)
    def carry(prev, cur):
        ok, r, c = cur
        pr, pc = prev
        r = jnp.where(ok, r, pr)
        c = jnp.where(ok, c, pc)
        return (r, c), (r, c)
    first_r = jnp.where(has[0], rows[0], (y0 + y1) // 2)
    first_c = jnp.where(has[0], cols[0], (x0 + x1) // 2)
    (_, _), (rs, cs) = jax.lax.scan(
        carry, (first_r, first_c), (has, rows, cols))

    ctrl = jnp.stack([rs, cs], axis=1).astype(jnp.float32)   # (K, 2) (row,col)
    curve = jnp.dot(bernstein, ctrl,
                    preferred_element_type=jnp.float32)      # (S, 2)
    r = jnp.clip(curve[:, 0], y0.astype(jnp.float32), y1.astype(jnp.float32))
    c = jnp.clip(curve[:, 1], x0.astype(jnp.float32), x1.astype(jnp.float32))
    scr = jnp.stack([c, r], axis=1)                          # (col, row)
    rect = jnp.stack([(x0 + x1) // 2, (y0 + y1) // 2,
                      x1 - x0, y1 - y0]).astype(jnp.float32)
    okf = nonempty.astype(jnp.float32)
    return scr * okf, rect * okf


def bernstein_matrix(num_ctrl: int, num_samples: int) -> jnp.ndarray:
    """(num_samples, num_ctrl) Bezier basis (bezier.evaluate_multi equiv)."""
    from math import comb
    import numpy as np
    p = num_ctrl - 1
    s = np.linspace(0.0, 1.0, num_samples)[:, None]
    i = np.arange(p + 1)[None, :]
    coef = np.array([comb(p, j) for j in range(p + 1)], np.float64)
    return jnp.asarray(coef * (s ** i) * ((1 - s) ** (p - i)), jnp.float32)


def synth_scribbles(gt: jnp.ndarray, key: jax.Array, num_ctrl: int = 10,
                    num_samples: int = 1000):
    """Batched on-device cal_scribble. gt: (B, H, W).
    Returns (scribbles (B, S, 2) of (col, row), rects (B, 4))."""
    b = gt.shape[0]
    bern = bernstein_matrix(num_ctrl, num_samples)
    keys = jax.random.split(key, b)
    masks = connected_regions_mask_batch(gt > 0.5)
    return jax.vmap(lambda m, k: _synth_scribble_one(
        m, k, num_ctrl, num_samples, bern))(masks, keys)


# ---------------------------------------------------------------------------
# combined round update (get_next_promts, trainer.py:703-768)
# ---------------------------------------------------------------------------

def get_next_prompts(pred: jnp.ndarray, gt: jnp.ndarray, points: jnp.ndarray,
                     ed_mask: jnp.ndarray, key: jax.Array,
                     pred_thresh: float = 0.49, as_allmask: bool = False,
                     jitter_box: bool = True, update_points: bool = True):
    """One round of prompt simulation: boxes from the current error masks +
    the next click + ed-mask labels. Scribbles are supplied by the data
    pipeline (they depend only on gt — trainer.py:727 calls cal_scribble(gt)).

    pred/gt: (B, H, W); points: (B, 2N, 3); ed_mask: (B, H, W, 2N) bool.
    Returns (points, boxes (B,5), ed_mask)."""
    kc, kb = jax.random.split(key)
    if not update_points:
        # click_indx == 0 path (trainer.py:370-376): boxes/scribbles only.
        # The click (and its EDT pair, ~10 ms at b8 448^2) is never consumed
        # here, so compute only the error masks synth_boxes needs.
        gtm = gt > 0.5
        fn = gtm & (pred < pred_thresh)
        fp = (~gtm) & (pred > pred_thresh)
        boxes = synth_boxes(gt, fn, fp, points, kb,
                            as_allmask=as_allmask, jitter=jitter_box)
        return points, boxes, ed_mask
    new_points, info = next_clicks(pred, gt, points, kc, pred_thresh)
    boxes = synth_boxes(gt, info.fn_mask, info.fp_mask, points, kb,
                        as_allmask=as_allmask, jitter=jitter_box)
    return new_points, boxes, update_ed_mask(ed_mask, info)
