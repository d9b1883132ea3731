"""PPuE — Probabilistic Prompt-unified Encoder, vectorized on device.

Encodes every prompt type (click / box / scribble) as a pair of 1-D Gaussian
profiles over the image axes plus a 3-bit type label, producing the unified
(B, 2*N, 2*W + 3) prompt-query tensor consumed by the DMA neck.

The reference builds these vectors with nested B x N numpy loops on host
(`isegm/model/ops.py:39-325`, invoked from `isegm/model/is_vpu_model.py:189-352`).
Here each encoder is a dense, masked, closed-form expression over the axis —
mathematically identical inside the clipped window — that vmaps over points
and batch and fuses into the surrounding XLA program.

Reference-semantics notes (kept bit-faithful; see unit tests):
  * Point rows are (y, x, order). The reference's click encoder assigns
    `x, y = lmks[0], lmks[1]` (ops.py:81), i.e. the FIRST profile (length W)
    is indexed by the ROW coordinate and the second by the COLUMN coordinate.
    The box encoder receives (x_center, y_center) and therefore puts the
    COLUMN profile first (is_vpu_model.py:266-273). This inconsistency is in
    the reference (the model was trained with it) and is reproduced.
  * Click Gaussian: sigma=3, radius=9, `heighten_peak` adds +1 at the center
    (ops.py:51-61). Box Gaussian: kernel = (side//2*2 - 1) taps, sigma =
    radius//3 (integer), zero vector when sigma == 0 (ops.py:144-167).
  * Window-validity: a profile pair is zeroed when BOTH corner points
    (ul, br) fall outside [0, W] x [0, H] (ops.py:90-94) — the check couples
    the two axes; reproduced exactly.
  * Rows whose label (points[..., 2]) is -1 become the `not_a_point` vector
    [0 ... 0, 0, 0, 1] (is_vpu_model.py:215-216).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PPuEConfig:
    input_h: int = 448
    input_w: int = 448
    sigma: float = 3.0
    heighten_peak: bool = True
    upsampling_scale: int = 4
    input_over_output_stride: int = 4

    @property
    def output_h(self) -> int:
        return int(self.input_h * self.upsampling_scale / self.input_over_output_stride)

    @property
    def output_w(self) -> int:
        return int(self.input_w * self.upsampling_scale / self.input_over_output_stride)

    @property
    def vec_dim(self) -> int:
        return self.output_w + self.output_h + 3


def _in_img(p0, p1, w, h):
    """Reference `is_point_in_img` (ops.py:63-67): inclusive upper bound."""
    return (p0 >= 0) & (p0 <= w) & (p1 >= 0) & (p1 <= h)


def _gauss_profile(length: int, center: jnp.ndarray, sigma: jnp.ndarray,
                   radius: jnp.ndarray, heighten: bool) -> jnp.ndarray:
    """exp(-(i-center)^2 / (2 sigma^2)) for |i-center| <= radius, else 0."""
    idx = jnp.arange(length, dtype=jnp.float32)
    d = idx - center.astype(jnp.float32)
    g = jnp.exp(-(d * d) / (2.0 * jnp.square(sigma.astype(jnp.float32))))
    g = jnp.where(jnp.abs(d) <= radius.astype(jnp.float32), g, 0.0)
    if heighten:
        g = g + (d == 0).astype(jnp.float32)
    return g


def _click_vec(cfg: PPuEConfig, pt: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One click (y, x, order) -> (profile0[W], profile1[H]).

    profile0 is indexed by the row coordinate (reference ops.py:81-104).
    """
    scale = cfg.upsampling_scale / cfg.input_over_output_stride
    a = jnp.trunc(pt[0] * scale).astype(jnp.int32)   # row coord -> first profile
    b = jnp.trunc(pt[1] * scale).astype(jnp.int32)   # col coord -> second profile
    radius = jnp.int32(int(cfg.sigma * 3))
    sigma = jnp.float32(cfg.sigma)

    ul0, ul1 = a - radius, b - radius
    br0, br1 = a + radius + 1, b + radius + 1
    valid = _in_img(ul0, ul1, cfg.output_w, cfg.output_h) | \
            _in_img(br0, br1, cfg.output_w, cfg.output_h)

    v0 = _gauss_profile(cfg.output_w, a, sigma, radius, cfg.heighten_peak)
    v1 = _gauss_profile(cfg.output_h, b, sigma, radius, cfg.heighten_peak)
    validf = valid.astype(jnp.float32)
    return v0 * validf, v1 * validf


def ppue_click(points: jnp.ndarray, cfg: PPuEConfig = PPuEConfig(),
               num_max_points: Optional[int] = None) -> jnp.ndarray:
    """(B, 2N, 3) points -> (B, 2*num_max_points, W+H+3) prompt queries.

    Matches `VitMultiGaussianVector_ed_Model._guassinvector_click`
    (is_vpu_model.py:189-230) including slot padding to num_max_points.
    """
    b, twon, _ = points.shape
    n = twon // 2
    nmax = num_max_points or n
    pts = points.astype(jnp.float32)

    v0, v1 = jax.vmap(jax.vmap(lambda p: _click_vec(cfg, p)))(pts)   # (B, 2N, L)

    labels = pts[:, :, 2]
    is_pos = jnp.arange(twon) < n
    type_lbl = jnp.where(is_pos[None, :, None],
                         jnp.array([1.0, 0.0, 0.0])[None, None, :],
                         jnp.array([0.0, 1.0, 0.0])[None, None, :])
    type_lbl = jnp.broadcast_to(type_lbl, (b, twon, 3))

    vec = jnp.concatenate([v0, v1, type_lbl], axis=-1)               # (B, 2N, D)

    not_a_point = jnp.zeros((cfg.vec_dim,)).at[-1].set(1.0)
    vec = jnp.where((labels == -1)[:, :, None], not_a_point[None, None, :], vec)

    if nmax != n:
        pad = jnp.broadcast_to(not_a_point, (b, nmax - n, cfg.vec_dim))
        vec = jnp.concatenate([vec[:, :n], pad, vec[:, n:], pad], axis=1)
    return vec


def _box_vec(cfg: PPuEConfig, box: jnp.ndarray) -> jnp.ndarray:
    """One box (x_c, y_c, w, h, slot) -> (W+H,) profile pair.

    Matches GaussianVector_box.gen_guassian_vector (ops.py:138-202): the
    FIRST profile is the column profile (centered x_c, extent from w).
    """
    xc, yc, bw, bh = box[0], box[1], box[2], box[3]
    nonnull = (xc + yc + bw + bh) != 0

    kw = (bw.astype(jnp.int32) // 2) * 2 - 1
    radius_w = (kw - 1) // 2
    sigma_w = radius_w // 3
    kh = (bh.astype(jnp.int32) // 2) * 2 - 1
    radius_h = (kh - 1) // 2
    sigma_h = radius_h // 3
    ok = nonnull & (sigma_w > 0) & (sigma_h > 0)

    scale = cfg.upsampling_scale / cfg.input_over_output_stride
    cx = jnp.trunc(xc.astype(jnp.float32) * scale).astype(jnp.int32)
    cy = jnp.trunc(yc.astype(jnp.float32) * scale).astype(jnp.int32)

    valid = _in_img(cx - radius_w, cy - radius_h, cfg.output_w, cfg.output_h) | \
            _in_img(cx + radius_w + 1, cy + radius_h + 1, cfg.output_w, cfg.output_h)
    ok = ok & valid

    sig_w = jnp.maximum(sigma_w, 1).astype(jnp.float32)
    sig_h = jnp.maximum(sigma_h, 1).astype(jnp.float32)
    v0 = _gauss_profile(cfg.output_w, cx, sig_w, radius_w, False)
    v1 = _gauss_profile(cfg.output_h, cy, sig_h, radius_h, False)
    okf = ok.astype(jnp.float32)
    return jnp.concatenate([v0 * okf, v1 * okf])


def ppue_box(points: jnp.ndarray, boxes: jnp.ndarray,
             cfg: PPuEConfig = PPuEConfig(),
             num_max_points: Optional[int] = None) -> jnp.ndarray:
    """Click encoding with the row `boxes[:, 4]` replaced by the box vector.

    boxes: (B, 5) of (x_center, y_center, width, height, slot_index).
    Matches `_guassinvector_box` (is_vpu_model.py:233-291): the box row gets
    type label [1,0,0] if slot < N else [0,1,0], and replacement happens
    BEFORE padding to num_max_points (slot indices refer to the unpadded
    2N layout).
    """
    b, twon, _ = points.shape
    n = twon // 2
    vec = ppue_click(points, cfg, num_max_points=None)   # unpadded (B, 2N, D)

    profile = jax.vmap(lambda bx: _box_vec(cfg, bx))(boxes.astype(jnp.float32))
    slot = boxes[:, 4].astype(jnp.int32)
    lbl = jnp.where((slot < n)[:, None],
                    jnp.array([1.0, 0.0, 0.0])[None, :],
                    jnp.array([0.0, 1.0, 0.0])[None, :])
    box_row = jnp.concatenate([profile, lbl], axis=-1)   # (B, D)

    onehot = jax.nn.one_hot(slot, twon, dtype=vec.dtype)  # (B, 2N)
    vec = vec * (1.0 - onehot[:, :, None]) + box_row[:, None, :] * onehot[:, :, None]

    nmax = num_max_points or n
    if nmax != n:
        not_a_point = jnp.zeros((cfg.vec_dim,)).at[-1].set(1.0)
        pad = jnp.broadcast_to(not_a_point, (b, nmax - n, cfg.vec_dim))
        vec = jnp.concatenate([vec[:, :n], pad, vec[:, n:], pad], axis=1)
    return vec


def _scribble_vec(cfg: PPuEConfig, scribble: jnp.ndarray,
                  rect: jnp.ndarray) -> jnp.ndarray:
    """One scribble (S, 2) samples of (col, row) + rect
    (col_center, row_center, col_extent, row_extent).

    Profiles encode, per axis bucket, exp(-(d_edge)^2 / (2 sigma^2)) where
    d_edge is the curve's distance from the box's min edge on the other axis
    (the reference's stated intent; its host implementation of this path is
    unused by the shipped training/eval configs — trainer.py:367 draws
    prompt types from {click, box} only — so we define the clean spec here
    and document it; see SURVEY.md §2.3).
    """
    # rect layout from cal_scribble (trainer.py:1209): (x_c, y_c, w, h) with
    # x = columns — i.e. (col_center, row_center, col_extent, row_extent)
    xc, yc, bw, bh = rect[0], rect[1], rect[2], rect[3]
    nonnull = (jnp.sum(scribble) + jnp.sum(rect)) != 0
    row_top = yc - bh // 2
    col_left = xc - bw // 2
    sigma2 = 2.0 * cfg.sigma * cfg.sigma

    cols = jnp.trunc(scribble[:, 0]).astype(jnp.int32)
    rows = jnp.trunc(scribble[:, 1]).astype(jnp.int32)

    qx = jnp.exp(-jnp.square(rows.astype(jnp.float32) - row_top) / sigma2)
    qy = jnp.exp(-jnp.square(cols.astype(jnp.float32) - col_left) / sigma2)

    v0 = jnp.zeros((cfg.output_w,)).at[jnp.clip(cols, 0, cfg.output_w - 1)].set(
        qx, mode="drop")
    v1 = jnp.zeros((cfg.output_h,)).at[jnp.clip(rows, 0, cfg.output_h - 1)].set(
        qy, mode="drop")
    okf = nonnull.astype(jnp.float32)
    return jnp.concatenate([v0 * okf, v1 * okf])


def ppue_scribble(points: jnp.ndarray, scribbles: jnp.ndarray,
                  rects: jnp.ndarray, cfg: PPuEConfig = PPuEConfig(),
                  num_max_points: Optional[int] = None) -> jnp.ndarray:
    """Click encoding with the LAST valid positive slot replaced by the
    scribble vector (is_vpu_model.py:294-352).

    scribbles: (B, S, 2) curve samples (col, row); rects: (B, 4).
    """
    b, twon, _ = points.shape
    n = twon // 2
    vec = ppue_click(points, cfg, num_max_points=None)

    profile = jax.vmap(lambda s, r: _scribble_vec(cfg, s, r))(
        scribbles.astype(jnp.float32), rects.astype(jnp.float32))
    row = jnp.concatenate(
        [profile, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (b, 3))], axis=-1)

    labels = points[:, :n, 2]
    has_valid = jnp.any(labels != -1, axis=1)
    # last index with label != -1 (reference: scribble_index[...][-1][1])
    idx = (n - 1) - jnp.argmax((labels != -1)[:, ::-1].astype(jnp.int32), axis=1)

    onehot = jax.nn.one_hot(idx, twon, dtype=vec.dtype) * has_valid[:, None]
    vec = vec * (1.0 - onehot[:, :, None]) + row[:, None, :] * onehot[:, :, None]

    nmax = num_max_points or n
    if nmax != n:
        not_a_point = jnp.zeros((cfg.vec_dim,)).at[-1].set(1.0)
        pad = jnp.broadcast_to(not_a_point, (b, nmax - n, cfg.vec_dim))
        vec = jnp.concatenate([vec[:, :n], pad, vec[:, n:], pad], axis=1)
    return vec
