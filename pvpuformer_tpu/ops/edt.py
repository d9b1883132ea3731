"""Exact squared Euclidean distance transform + next-click selection, on device.

Replaces the per-click host round-trip through `cv2.distanceTransform`
(reference `isegm/inference/clicker.py:29-56`, `isegm/engine/trainer.py:615-654`)
so the whole interactive round stays inside one XLA dispatch.

Semantics (validated against cv2.DIST_L2 / maskSize=0 in unit tests):
  * `squared_edt(mask)[r, c]` = squared distance from (r, c) to the nearest
    zero pixel of `mask`, where the 1-pixel ring just outside the array also
    counts as zero — this reproduces the reference's `np.pad(..., 1)` before
    the transform (clicker.py:33-42).
  * Distances are exact integers (< 2^24 for any realistic image) computed
    in f32, so max/argmax tie patterns match cv2's exact float transform.
  * `next_click_from_error` picks argmax with numpy row-major first-match
    tie-breaking (clicker.py:52-56 uses `np.where(...)[0][0]`).

Algorithm: separable exact EDT.
  pass 1 (per column): distance in rows to the nearest zero, via two
     associative max-scans (nearest zero above / below) — O(H log H) depth.
  pass 2 (per row): D[r, c] = min_{c'} dcol^2[r, c'] + (c - c')^2, evaluated
     as a chunked dense min-reduction (a min-plus product). For eval canvases
     (<= ~1k^2) this is a few hundred MFLOPs on the VPU — well under the
     per-click budget — and avoids the sequential lower-envelope scan that
     XLA cannot parallelize.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _col_dist(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-column row-distance to nearest zero (incl. virtual border rows).

    mask: (H, W) bool; returns (H, W) int32 distances (0 where mask is 0).
    """
    h = mask.shape[0]
    rows = jnp.arange(h, dtype=jnp.int32)[:, None]
    # nearest zero at or above: running max of row index over zero pixels,
    # with a virtual zero row at -1.
    zero_at = jnp.where(mask, jnp.int32(-h - 1), rows)   # -h-1 acts as -inf
    above = jax.lax.associative_scan(jnp.maximum, jnp.maximum(zero_at, -1), axis=0)
    d_up = rows - above
    # nearest zero at or below, virtual zero row at H.
    zero_at_dn = jnp.where(mask, jnp.int32(2 * h + 1), rows)
    below = jax.lax.associative_scan(jnp.minimum, jnp.minimum(zero_at_dn, h),
                                     axis=0, reverse=True)
    d_dn = below - rows
    return jnp.minimum(d_up, d_dn).astype(jnp.int32)


def _col_dist2_dense(mask: jnp.ndarray) -> jnp.ndarray:
    """Pass 1 in the SAME dense min-plus form as pass 2: dcol²[r, c] =
    min_{r'} (r - r')² over zero rows r' (virtual zeros at -1 and H).

    Numerically identical to `_col_dist`² (exact integers in f32; the BIG
    sentinel keeps masked rows above any real distance but below f32's
    exact-integer range). Why it exists: the associative max/min scans of
    `_col_dist` lower to ~15 ms/round of odd-sized slice/concat steps in the
    b16 batched-eval program (trace 2026-08-21), while ONE fused
    broadcast+min reduction of the identical shape family as pass 2 runs in
    ~2.4 ms — the batched evaluator therefore selects rows="dense"
    (PredictorConfig.edt_rows)."""
    h = mask.shape[0]
    rows = jnp.arange(h, dtype=jnp.float32)
    off = jnp.square(rows[:, None] - rows[None, :])       # (H, H)
    big = jnp.float32((2 * h + 2) ** 2)
    z = jnp.where(mask, big, 0.0)                         # (H, W)
    d = jnp.min(off[:, :, None] + z[None, :, :], axis=1)  # (H, W)
    border = jnp.minimum(jnp.square(rows + 1.0), jnp.square(h - rows))
    return jnp.minimum(d, border[:, None])


_DEFAULT_IMPL = "xla"


def set_default_impl(impl: str) -> None:
    """Select the min-plus pass implementation globally: "xla" (fused
    reduction) or "pallas" (ops/edt_pallas.py). Takes effect for programs
    traced after the call."""
    global _DEFAULT_IMPL
    assert impl in ("xla", "pallas"), impl
    _DEFAULT_IMPL = impl


@functools.partial(jax.jit, static_argnames=("chunk", "impl", "rows"))
def squared_edt(mask: jnp.ndarray, chunk: Optional[int] = 32,
                impl: Optional[str] = None, rows: str = "scan") -> jnp.ndarray:
    """Exact squared EDT of (H, W) bool mask (distance to nearest zero/border).

    chunk sizes the min-plus pass's column blocks. Measured on v5e at 448^2:
    standalone, one unchunked fused block (chunk=None -> W) is ~2.5x faster
    (0.46 vs 1.12 ms/pair); INSIDE the full click-step program the ordering
    flips (4.22 ms/click at chunk=32 vs 4.38 unchunked — the big fused
    reduce competes for VMEM with the model), so the default stays 32.

    rows: "scan" (associative-scan pass 1) or "dense" (min-plus pass 1,
    _col_dist2_dense) — bit-identical outputs; dense wins in the batched
    evaluator, scan stays the single-session default."""
    h, w = mask.shape
    if rows == "dense":
        dcol2 = _col_dist2_dense(mask)                    # (H, W) f32
    else:
        dcol = _col_dist(mask)
        dcol2 = jnp.square(dcol.astype(jnp.float32))      # (H, W)

    if (impl or _DEFAULT_IMPL) == "pallas":
        from .edt_pallas import minplus_rows
        d = minplus_rows(dcol2, interpret=jax.default_backend() != "tpu")
        cols_f = jnp.arange(w, dtype=jnp.float32)
        border = jnp.minimum(jnp.square(cols_f + 1.0),
                             jnp.square(w - cols_f))
        return jnp.where(mask, jnp.minimum(d, border[None, :]), 0.0)

    cols = jnp.arange(w, dtype=jnp.float32)
    if chunk is None:
        chunk = w

    pad_w = (-w) % chunk
    n_chunks = (w + pad_w) // chunk

    def one_chunk(ci):
        c_out = ci * chunk + jnp.arange(chunk, dtype=jnp.float32)  # (chunk,)
        off = jnp.square(c_out[:, None] - cols[None, :])           # (chunk, W)
        d = jnp.min(dcol2[:, None, :] + off[None, :, :], axis=-1)  # (H, chunk)
        # virtual zero columns at -1 and W
        border = jnp.minimum(jnp.square(c_out + 1.0), jnp.square(w - c_out))
        return jnp.minimum(d, border[None, :])

    if n_chunks == 1:
        out = one_chunk(jnp.int32(0))                     # (H, chunk=W)
        return jnp.where(mask, out[:, :w], 0.0)
    out = jax.lax.map(one_chunk, jnp.arange(n_chunks))    # (n_chunks, H, chunk)
    out = jnp.moveaxis(out, 0, 1).reshape(h, n_chunks * chunk)[:, :w]
    return jnp.where(mask, out, 0.0)


def squared_edt_pair(fn_mask: jnp.ndarray, fp_mask: jnp.ndarray,
                     impl: Optional[str] = None, chunk: Optional[int] = 32,
                     rows: str = "scan"):
    """Both error-mask EDTs in one fused computation (the two transforms are
    independent — batching them halves the kernel's wall time vs two calls).

    chunk follows squared_edt: 32 wins inside the eval click-step program
    (VMEM competition with the model); None (one fused min-reduction) wins
    6.6x when the EDT runs standalone between model invocations, as in the
    vmapped training round loop (1.6 vs 10.7 ms for 16x448^2 on v5e)."""
    d = jax.vmap(lambda m: squared_edt(m, chunk=chunk, impl=impl, rows=rows))(
        jnp.stack([fn_mask, fp_mask]))
    return d[0], d[1]


def resolve_impl(impl: Optional[str]) -> str:
    """"auto" -> the Pallas kernel on TPU, the XLA reduction elsewhere.
    Measured v5e 448^2: pallas wins in a single-session scan (4.10 vs 4.24
    ms/click) but loses inside nested scans (5.17 vs 4.50) — pick per
    context; PredictorConfig defaults to "xla"."""
    if impl in (None, "auto"):
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def next_click_from_error(fn_mask: jnp.ndarray, fp_mask: jnp.ndarray,
                          not_clicked: jnp.ndarray,
                          impl: Optional[str] = None,
                          chunk: Optional[int] = 32,
                          rows: str = "scan"):
    """Oracle next-click: center of the larger of the FN / FP error regions.

    Reproduces Clicker._get_next_click (clicker.py:29-56):
    returns (is_positive, y, x, max_sqdist).
    """
    d_fn, d_fp = squared_edt_pair(fn_mask, fp_mask, impl=impl, chunk=chunk,
                                  rows=rows)
    d_fn = d_fn * not_clicked
    d_fp = d_fp * not_clicked
    fn_max = jnp.max(d_fn)
    fp_max = jnp.max(d_fp)
    is_positive = fn_max > fp_max
    d = jnp.where(is_positive, d_fn, d_fp)
    flat_idx = jnp.argmax(d.reshape(-1))                  # first max, row-major
    w = fn_mask.shape[1]
    y = flat_idx // w
    x = flat_idx % w
    return is_positive, y.astype(jnp.int32), x.astype(jnp.int32), jnp.maximum(fn_max, fp_max)


def sample_click_from_error(fn_mask: jnp.ndarray, fp_mask: jnp.ndarray,
                            key: jax.Array):
    """Training-time next-click: uniform sample from the region where the
    distance exceeds half the max (trainer.py:627-639). Returns
    (has_click, is_positive, y, x)."""
    d_fn, d_fp = squared_edt_pair(fn_mask, fp_mask)
    fn_max = jnp.max(d_fn)
    fp_max = jnp.max(d_fp)
    is_positive = fn_max > fp_max
    d = jnp.where(is_positive, d_fn, d_fp)
    # reference thresholds linear distance: dt > max/2  <=>  d2 > max2/4
    inner = d > jnp.maximum(fn_max, fp_max) / 4.0
    has_click = jnp.any(inner)
    # uniform over inner via Gumbel-max on the mask
    g = jax.random.gumbel(key, d.shape)
    score = jnp.where(inner, g, -jnp.inf)
    flat_idx = jnp.argmax(score.reshape(-1))
    w = fn_mask.shape[1]
    return has_click, is_positive, (flat_idx // w).astype(jnp.int32), (flat_idx % w).astype(jnp.int32)
