"""BRS (backpropagating refinement) predictors.

Re-derivation of the reference BRS family (`isegm/inference/predictors/
brs.py:9-307`, functors at `brs_functors.py:9-109`, losses at
`brs_losses.py:6-28`): after each click, a handful of auxiliary variables are
optimized with scipy L-BFGS-B to make the prediction consistent with the
clicks:

  * f-BRS  (`FeatureBRSPredictor`): per-channel scale/bias on an intermediate
    feature map — on VPU models the ViT backbone tokens (768-d), the natural
    insertion point (the reference's after_deeplab/after_c4 modes are
    backbone-specific; PARITY.md deviation #9). The backbone runs ONCE per
    click (the expensive part); each L-BFGS iteration re-runs only the tail.
  * f-BRS on zoo models (`ZooFeatureBRSPredictor`): the reference's OWN
    insertion points — HRNet 'A' (stride-4 concat feats, OCR+cls re-run) /
    'C' (pre-cls OCR feats, cls re-run) per brs.py:150-244, DeepLab
    after_c4 / after_aspp / after_deeplab per brs.py:53-147.
  * RGB-BRS (`InputBRSPredictor(optimize_target='rgb')`): additive
    perturbation of the RGB input — every L-BFGS iteration pays a full
    forward (brs.py:226-307). Works on every registered model family.
    Deviation: the delta enters BEFORE ImageNet normalization (the
    reference adds it after); this reparameterizes the search space by the
    per-channel 1/std factor, which L-BFGS absorbs — only the L2
    regularizer is effectively rescaled per channel.
  * DistMap-BRS (`optimize_target='dmaps'`): additive perturbation of the
    two disk/dist-map coord channels, never the prev-mask channel
    (brs.py:258-276, `__init__.py:76-77`); threaded into every model
    family via the `coord_bias` forward argument.

TPU-native split: the L-BFGS line search stays on host (scipy, as in the
reference), but each functor evaluation is ONE jitted value_and_grad
dispatch — loss, BRS click-consistency terms and gradients fused on device.

Deviation (documented): zoom-in is driven by the same fused ROI machinery as
the NoBRS predictor (predictor.py) instead of the reference's transform
object chain; `f_max` early-exit and `min_iou_diff` stopping mirror
brs_functors.py:60-72.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import fmin_l_bfgs_b

from ..models.vpu import (VPUConfig, coord_features, prepare_input,
                          vpu_backbone_embed)
from ..models.fpn import neck_forward
from ..models.seg_head import head_forward
from ..ops.ppue import ppue_click
from ..ops.resize import bilinear_resize, roi_crop_resize, roi_paste_back
from ..ops.edt import next_click_from_error
from .predictor import (PredictorConfig, SessionState, init_session,
                        _update_roi, _transform_points)


def brs_mask_loss(result: jnp.ndarray, pos_mask: jnp.ndarray,
                  neg_mask: jnp.ndarray, eps: float = 1e-5):
    """BRSMaskLoss (brs_losses.py:6-28). result: sigmoid probs."""
    pos_diff = (1.0 - result) * pos_mask
    pos_target = jnp.sum(pos_diff ** 2) / (jnp.sum(pos_mask) + eps)
    neg_diff = result * neg_mask
    neg_target = jnp.sum(neg_diff ** 2) / (jnp.sum(neg_mask) + eps)
    loss = pos_target + neg_target
    return loss, jnp.max(jnp.abs(pos_diff)), jnp.max(jnp.abs(neg_diff))


def click_maps(points: jnp.ndarray, h: int, w: int, radius: int = 1):
    """_get_clicks_maps_nd (brs.py:23-43): 3x3 stamps at click coords."""
    n = points.shape[1] // 2
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]

    def one_half(pts):
        valid = pts[:, 2] >= 0
        dy = jnp.abs(yy[None] - pts[:, 0, None, None])
        dx = jnp.abs(xx[None] - pts[:, 1, None, None])
        stamp = (dy <= radius) & (dx <= radius) & valid[:, None, None]
        return jnp.any(stamp, axis=0).astype(jnp.float32)

    pos = jax.vmap(lambda p: one_half(p[:n]))(points)
    neg = jax.vmap(lambda p: one_half(p[n:]))(points)
    return pos, neg


# ---------------------------------------------------------------------------
# jitted model pieces
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _backbone_tokens(params, cfg: VPUConfig, crop: jnp.ndarray,
                     pts: jnp.ndarray):
    crop = crop.astype(cfg.dtype)
    rgb, prev_mask = prepare_input(cfg, crop)
    coords = coord_features(cfg, rgb, prev_mask, pts)
    tokens = vpu_backbone_embed(params, cfg, rgb, coords)
    pv = ppue_click(pts, cfg.ppue, num_max_points=cfg.num_max_points)
    return tokens, pv.astype(cfg.dtype)


def _head_logits(params, cfg: VPUConfig, tokens, pv, th: int, tw: int):
    ms_feats, q_out = neck_forward(params["neck"], cfg.neck, tokens, pv,
                                   cfg.backbone.grid_size)
    seg, _ = head_forward(params["head"], cfg.head, ms_feats, q_out)
    return bilinear_resize(seg, th, tw, align_corners=True)


def _scale_bias_objective(params, cfg: VPUConfig, tokens, pv, opt, pos, neg,
                          reg_weight: float, reg_bias_weight: float,
                          with_flip: bool, th: int, tw: int):
    scale, bias = jnp.split(opt, 2)
    reg = reg_weight * (jnp.sum(scale ** 2)
                        + reg_bias_weight * jnp.sum(bias ** 2))
    mod = tokens.astype(jnp.float32) * (1.0 + scale) + bias
    logits = _head_logits(params, cfg, mod.astype(tokens.dtype), pv, th, tw)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]
    if with_flip:
        probs = 0.5 * (probs[:1] + probs[1:, :, ::-1])
        pos, neg = pos[:1], neg[:1]
    loss, fmax_pos, fmax_neg = brs_mask_loss(probs, pos, neg)
    return loss + reg, (logits, fmax_pos, fmax_neg)


@functools.partial(jax.jit, static_argnames=("cfg", "reg_weight",
                                             "reg_bias_weight", "with_flip",
                                             "th", "tw"))
def _scale_bias_grad(params, cfg: VPUConfig, tokens, pv, opt, pos, neg, *,
                     reg_weight, reg_bias_weight, with_flip, th, tw):
    return jax.value_and_grad(_scale_bias_objective, argnums=4,
                              has_aux=True)(params, cfg, tokens, pv, opt,
                                            pos, neg, reg_weight,
                                            reg_bias_weight, with_flip,
                                            th, tw)


# --- f-BRS-B: scale/bias on the neck's multi-scale maps ---------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _neck_feats(params, cfg: VPUConfig, tokens, pv):
    ms, q_out = neck_forward(params["neck"], cfg.neck, tokens, pv,
                             cfg.backbone.grid_size)
    return tuple(ms), q_out


def _neck_objective(params, cfg: VPUConfig, ms, q_out, opt, pos, neg,
                    reg_weight, reg_bias_weight, with_flip, th, tw):
    dims = [m.shape[-1] for m in ms]
    total = sum(dims)
    scale_all, bias_all = opt[:total], opt[total:]
    reg = reg_weight * (jnp.sum(scale_all ** 2)
                        + reg_bias_weight * jnp.sum(bias_all ** 2))
    mod = []
    off = 0
    for m, d in zip(ms, dims):
        s = scale_all[off:off + d]
        b = bias_all[off:off + d]
        mod.append((m.astype(jnp.float32) * (1.0 + s) + b).astype(m.dtype))
        off += d
    seg, _ = head_forward(params["head"], cfg.head, list(mod), q_out)
    logits = bilinear_resize(seg, th, tw, align_corners=True)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]
    if with_flip:
        probs = 0.5 * (probs[:1] + probs[1:, :, ::-1])
        pos, neg = pos[:1], neg[:1]
    loss, fmax_pos, fmax_neg = brs_mask_loss(probs, pos, neg)
    return loss + reg, (logits, fmax_pos, fmax_neg)


@functools.partial(jax.jit, static_argnames=("cfg", "reg_weight",
                                             "reg_bias_weight", "with_flip",
                                             "th", "tw"))
def _neck_grad(params, cfg: VPUConfig, ms, q_out, opt, pos, neg, *,
               reg_weight, reg_bias_weight, with_flip, th, tw):
    return jax.value_and_grad(_neck_objective, argnums=4, has_aux=True)(
        params, cfg, ms, q_out, opt, pos, neg, reg_weight, reg_bias_weight,
        with_flip, th, tw)


# --- f-BRS-C: scale/bias on the head's fused features ------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _head_fused(params, cfg: VPUConfig, tokens, pv):
    from ..models.seg_head import _fuse
    ms, q_out = neck_forward(params["neck"], cfg.neck, tokens, pv,
                             cfg.backbone.grid_size)
    return _fuse(params["head"], cfg.head, ms)


def _head_objective(params, cfg: VPUConfig, fused, opt, pos, neg,
                    reg_weight, reg_bias_weight, with_flip, th, tw):
    from .. import nn as _nn
    d = fused.shape[-1]
    scale, bias = opt[:d], opt[d:]
    reg = reg_weight * (jnp.sum(scale ** 2)
                        + reg_bias_weight * jnp.sum(bias ** 2))
    mod = (fused.astype(jnp.float32) * (1.0 + scale) + bias).astype(fused.dtype)
    seg = _nn.conv1x1(params["head"]["conv_seg"], mod)
    logits = bilinear_resize(seg, th, tw, align_corners=True)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]
    if with_flip:
        probs = 0.5 * (probs[:1] + probs[1:, :, ::-1])
        pos, neg = pos[:1], neg[:1]
    loss, fmax_pos, fmax_neg = brs_mask_loss(probs, pos, neg)
    return loss + reg, (logits, fmax_pos, fmax_neg)


@functools.partial(jax.jit, static_argnames=("cfg", "reg_weight",
                                             "reg_bias_weight", "with_flip",
                                             "th", "tw"))
def _head_grad(params, cfg: VPUConfig, fused, opt, pos, neg, *,
               reg_weight, reg_bias_weight, with_flip, th, tw):
    return jax.value_and_grad(_head_objective, argnums=3, has_aux=True)(
        params, cfg, fused, opt, pos, neg, reg_weight, reg_bias_weight,
        with_flip, th, tw)


# --- generic feature-BRS machinery for zoo models ---------------------------
#
# One trunk/tail split per insertion point. The trunk runs once per click;
# the tail re-runs per L-BFGS iteration on the scaled feature map. Tails are
# module-level functions so the jitted grad is cached per tail identity.

@functools.partial(jax.jit, static_argnames=("cfg", "insertion"))
def _zoo_trunk(params, cfg, crop, pts, *, insertion: str):
    """(feat, rest): `feat` gets the scale/bias; `rest` is passed through."""
    from ..models.zoo.hrnet import HRNetISConfig, hrnet_feats, _ocr_pre_cls
    from ..models.zoo.deeplab import (DeeplabISConfig, deeplab_backbone,
                                      deeplab_aspp_concat, deeplab_decoder)
    crop = crop.astype(cfg.dtype)
    if isinstance(cfg, HRNetISConfig):
        feats = hrnet_feats(params, cfg, crop, pts)
        if insertion == "A":            # reference brs.py:231-234
            return feats, ()
        y, _aux = _ocr_pre_cls(params["ocr"], feats)   # brs.py:236-240
        return y, ()
    assert isinstance(cfg, DeeplabISConfig), type(cfg).__name__
    skip, c4 = deeplab_backbone(params, cfg, crop, pts)
    if insertion == "after_c4":         # brs.py:132-143 (c1 cached)
        return c4, (skip,)
    y = deeplab_aspp_concat(params, c4, skip)
    if insertion == "after_aspp":       # brs.py:136-140
        return y, ()
    return deeplab_decoder(params, y), ()   # after_deeplab, brs.py:144-145


def _tail_hrnet_A(params, cfg, mod):
    from ..models.zoo.hrnet import _ocr
    return _ocr(params["ocr"], mod)[0]       # reference brs.py:184-193


def _tail_hrnet_C(params, cfg, mod):
    from .. import nn as _nn
    return _nn.conv1x1(params["ocr"]["cls"], mod)   # brs.py:194-195


def _tail_deeplab_c4(params, cfg, mod, skip):
    from ..models.zoo.deeplab import (deeplab_aspp_concat, deeplab_decoder,
                                      deeplab_seg_head)
    y = deeplab_aspp_concat(params, mod, skip)      # brs.py:90-95
    return deeplab_seg_head(params, deeplab_decoder(params, y))


def _tail_deeplab_aspp(params, cfg, mod):
    from ..models.zoo.deeplab import deeplab_decoder, deeplab_seg_head
    return deeplab_seg_head(params, deeplab_decoder(params, mod))


def _tail_deeplab_head(params, cfg, mod):
    from ..models.zoo.deeplab import deeplab_seg_head
    return deeplab_seg_head(params, mod)            # brs.py:96-99


_ZOO_TAILS = {"A": _tail_hrnet_A, "C": _tail_hrnet_C,
              "after_c4": _tail_deeplab_c4, "after_aspp": _tail_deeplab_aspp,
              "after_deeplab": _tail_deeplab_head}


@functools.lru_cache(maxsize=None)
def _make_feature_grad(tail):
    """Jitted value_and_grad of the scale/bias objective for one tail."""

    def objective(params, cfg, feat, rest, opt, pos, neg, reg_weight,
                  reg_bias_weight, with_flip, th, tw):
        d = feat.shape[-1]
        scale, bias = opt[:d], opt[d:]
        reg = reg_weight * (jnp.sum(scale ** 2)
                            + reg_bias_weight * jnp.sum(bias ** 2))
        mod = (feat.astype(jnp.float32) * (1.0 + scale)
               + bias).astype(feat.dtype)
        logits = tail(params, cfg, mod, *rest)
        logits = bilinear_resize(logits, th, tw, align_corners=True)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]
        if with_flip:
            probs = 0.5 * (probs[:1] + probs[1:, :, ::-1])
            pos, neg = pos[:1], neg[:1]
        loss, fmax_pos, fmax_neg = brs_mask_loss(probs, pos, neg)
        return loss + reg, (logits, fmax_pos, fmax_neg)

    grad = jax.value_and_grad(objective, argnums=4, has_aux=True)
    return jax.jit(grad, static_argnames=("cfg", "reg_weight",
                                          "reg_bias_weight", "with_flip",
                                          "th", "tw"))


class FeatureBRSPredictor:
    """f-BRS; drop-in for Predictor in the eval loop.

    `insertion` picks where the optimized scale/bias enters (the reference's
    -A/-B/-C insertion modes, brs.py:55-68, mapped to the VPU architecture):
      * "tokens" (A): backbone tokens — neck+head re-run per L-BFGS iter;
      * "neck"   (B): the 4 multi-scale neck maps — head re-runs per iter;
      * "head"   (C): the head's fused features — only cls conv re-runs
        (cheapest per-iteration cost, smallest capacity).
    """

    _INSERTIONS = ("tokens", "neck", "head")

    def __init__(self, params, cfg: PredictorConfig, reg_weight: float = 1e-3,
                 reg_bias_weight: float = 10.0, max_iters: int = 20,
                 optimize_after_n_clicks: int = 1, min_iou_diff: float = 0.01,
                 insertion: str = "tokens"):
        from ..nn import cast_params
        assert insertion in self._INSERTIONS, insertion
        self.params = cast_params(params, cfg.model.dtype)
        self.cfg = cfg
        self.reg_weight = reg_weight
        self.reg_bias_weight = reg_bias_weight
        self.max_iters = max_iters
        self.optimize_after_n_clicks = optimize_after_n_clicks
        self.min_iou_diff = min_iou_diff
        self.insertion = insertion
        self.state: Optional[SessionState] = None
        self.opt_data: Optional[np.ndarray] = None
        self._undo = []

    def _canvas(self, h, w):
        b = self.cfg.canvas_bucket
        return (-(-h // b) * b, -(-w // b) * b)

    def _setup(self, crop, pts, th, tw):
        """Run the trunk once; return (grad_fn, residual, opt_size) where
        `grad_fn(params, model_cfg, *residual, opt, pos, neg, **kwargs)`
        yields ((loss, (logits, fmax_pos, fmax_neg)), grad)."""
        cfg = self.cfg
        tokens, pv = _backbone_tokens(self.params, cfg.model, crop, pts)
        if self.insertion == "tokens":
            return _scale_bias_grad, (tokens, pv), 2 * tokens.shape[-1]
        if self.insertion == "neck":
            ms, q_out = _neck_feats(self.params, cfg.model, tokens, pv)
            return _neck_grad, (ms, q_out), 2 * sum(m.shape[-1] for m in ms)
        fused = _head_fused(self.params, cfg.model, tokens, pv)
        return _head_grad, (fused,), 2 * fused.shape[-1]

    def set_input(self, image: np.ndarray, gt_mask: np.ndarray) -> None:
        self.state = init_session(image, gt_mask,
                                  self.cfg.model.num_max_points,
                                  self._canvas(*image.shape[:2]))
        self.opt_data = None
        self._undo = []

    # -- one round (oracle or user click) -------------------------------------

    def _apply_click(self, st: SessionState, is_pos, cy, cx) -> SessionState:
        """Write one click into the session points (shared by the oracle
        and user-click paths)."""
        n = st.points.shape[1] // 2
        slot = jnp.where(is_pos, jnp.minimum(st.num_pos, n - 1),
                         n + jnp.minimum(st.num_neg, n - 1))
        row = jnp.stack([cy.astype(jnp.float32), cx.astype(jnp.float32),
                         st.click_count.astype(jnp.float32)])
        points = st.points.at[0, slot].set(row)
        return st._replace(
            points=points,
            num_pos=st.num_pos + is_pos.astype(jnp.int32),
            num_neg=st.num_neg + (~is_pos).astype(jnp.int32),
            not_clicked=st.not_clicked.at[cy, cx].set(False),
            click_count=st.click_count + 1)

    def next_click(self) -> float:
        """One oracle round (eval loop): EDT click from the gt error masks,
        then the BRS-optimized forward."""
        self._undo.append((self.state, None if self.opt_data is None
                           else self.opt_data.copy()))
        cfg = self.cfg
        st = self.state
        pred = st.prev_probs[0, :, :, 0] > cfg.prob_thresh
        gt_pos = st.gt == 1
        not_ignore = st.gt != -1
        fn = gt_pos & (~pred) & not_ignore
        fp = (~gt_pos) & pred & not_ignore
        is_pos, cy, cx, _ = next_click_from_error(fn, fp, st.not_clicked)
        st = self._apply_click(st, is_pos, cy, cx)
        return self._optimize_round(st)

    def user_click(self, y: float, x: float, is_positive: bool) -> float:
        """One USER-click round (the GUI path — click consistency only, no
        gt involved in click selection; controller.py:48-68). Returns IoU
        vs the session gt (0 when the demo session has no gt)."""
        self._undo.append((self.state, None if self.opt_data is None
                           else self.opt_data.copy()))
        st = self._apply_click(
            self.state, jnp.asarray(bool(is_positive)),
            jnp.asarray(int(round(y)), jnp.int32),
            jnp.asarray(int(round(x)), jnp.int32))
        return self._optimize_round(st)

    def _optimize_round(self, st: SessionState) -> float:
        cfg = self.cfg
        points = st.points

        # 2. ROI + crop (device, same machinery as predictor.py)
        roi, has_roi = _update_roi(cfg, st, points)
        roi_t = (roi[0], roi[1], roi[2], roi[3])
        th, tw = cfg.target_size
        net_in = jnp.concatenate([st.image, st.prev_probs], axis=-1)
        crop = roi_crop_resize(net_in, roi_t, th, tw)
        if cfg.with_flip:
            crop = jnp.concatenate([crop, crop[:, :, ::-1, :]], axis=0)
        pts = _transform_points(points, roi, (th, tw), cfg.with_flip)

        # 3. run the network up to the insertion point ONCE per click
        pos, neg = click_maps(pts, th, tw)
        kwargs = dict(reg_weight=self.reg_weight,
                      reg_bias_weight=self.reg_bias_weight,
                      with_flip=cfg.with_flip, th=th, tw=tw)
        grad_fn, residual, opt_size = self._setup(crop, pts, th, tw)

        # 4. L-BFGS over (scale, bias)
        if self.opt_data is None or self.opt_data.size != opt_size:
            self.opt_data = np.zeros((opt_size,), np.float32)

        num_clicks = int(st.click_count)
        if num_clicks >= self.optimize_after_n_clicks:
            best = {"loss": np.inf, "x": self.opt_data.copy()}
            last_mask = {"m": None}

            def functor(x):
                xj = jnp.asarray(x, jnp.float32)
                (loss, (logits, fp_, fn_)), grad = grad_fn(
                    self.params, cfg.model, *residual, xj, pos, neg, **kwargs)
                f_val = float(loss)
                if f_val < best["loss"]:
                    best["loss"] = f_val
                    best["x"] = np.asarray(x, np.float64).copy()
                # early exits (brs_functors.py:60-72)
                if float(fp_) < (1 - cfg.prob_thresh) and \
                        float(fn_) < cfg.prob_thresh:
                    return f_val, np.zeros_like(np.asarray(x))
                m = np.asarray(jax.nn.sigmoid(
                    logits[..., 0].astype(jnp.float32)) > cfg.prob_thresh)
                if last_mask["m"] is not None and self.min_iou_diff > 0:
                    inter = np.logical_and(m, last_mask["m"]).sum()
                    union = np.logical_or(m, last_mask["m"]).sum()
                    if union > 0 and inter / union > 1 - self.min_iou_diff:
                        return f_val, np.zeros_like(np.asarray(x))
                last_mask["m"] = m
                return f_val, np.asarray(grad, np.float64).ravel()

            x0 = self.opt_data.astype(np.float64)
            fmin_l_bfgs_b(func=functor, x0=x0, m=20,
                          factr=0, pgtol=1e-8, maxfun=self.max_iters)
            self.opt_data = best["x"].astype(np.float32)

        # 5. final forward with the optimized scale/bias (jitted; the extra
        # grad computation is dwarfed by the re-run trunk)
        opt = jnp.asarray(self.opt_data, jnp.float32)
        (_, (logits, _, _)), _ = grad_fn(
            self.params, cfg.model, *residual, opt, pos, neg, **kwargs)
        if cfg.with_flip:
            logits = 0.5 * (logits[:1] + logits[1:, :, ::-1, :])
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        hc, wc = st.gt.shape
        canvas = roi_paste_back(probs, roi_t, hc, wc)
        st = st._replace(prev_probs=canvas, roi=roi, has_roi=has_roi)
        self.state = st

        pm = np.asarray(canvas[0, :, :, 0]) > cfg.prob_thresh
        gt = np.asarray(st.gt)
        inter = np.logical_and(pm, gt == 1)[gt != -1].sum()
        union = np.logical_or(pm, gt == 1)[gt != -1].sum()
        return float(inter / max(union, 1))

    def run_clicks(self, num_clicks: int) -> np.ndarray:
        return np.array([self.next_click() for _ in range(num_clicks)],
                        np.float32)

    def undo_click(self) -> None:
        if self._undo:
            self.state, self.opt_data = self._undo.pop()

    @property
    def probs(self) -> np.ndarray:
        h, w = int(self.state.img_h), int(self.state.img_w)
        return np.asarray(self.state.prev_probs[0, :h, :w, 0])

    @property
    def clicks(self) -> np.ndarray:
        return np.asarray(self.state.points[0])


class ZooFeatureBRSPredictor(FeatureBRSPredictor):
    """f-BRS at the reference's own insertion points for zoo models:
    HRNet 'A'/'C' (HRNetFeatureBRSPredictor, brs.py:150-244) and DeepLab
    'after_c4'/'after_aspp'/'after_deeplab' (FeatureBRSPredictor,
    brs.py:53-147)."""

    _INSERTIONS = ("A", "C", "after_c4", "after_aspp", "after_deeplab")

    def _setup(self, crop, pts, th, tw):
        feat, rest = _zoo_trunk(self.params, self.cfg.model, crop, pts,
                                insertion=self.insertion)
        grad = _make_feature_grad(_ZOO_TAILS[self.insertion])

        def grad_fn(params, mcfg, f, r, opt, pos, neg, *, reg_weight,
                    reg_bias_weight, with_flip, th, tw):
            return grad(params, mcfg, f, r, opt, pos, neg, reg_weight,
                        reg_bias_weight, with_flip, th, tw)

        return grad_fn, (feat, rest), 2 * feat.shape[-1]


# ---------------------------------------------------------------------------
# Input BRS (RGB / dist-map perturbation)
# ---------------------------------------------------------------------------

def _input_objective(params, cfg, crop, pts, delta, pos, neg,
                     reg_weight: float, with_flip: bool, th: int, tw: int,
                     target: str):
    """Generic input-optimization objective (brs.py:252-290): works on any
    registered model family. target='rgb' perturbs the image channels
    (pre-normalization — see module docstring deviation note);
    target='dmaps' perturbs the two disk coord channels via `coord_bias`."""
    from ..models.registry import forward_for
    reg = reg_weight * jnp.sum(delta ** 2)
    nch = 3 if target == "rgb" else 2
    d = delta.reshape(1, th, tw, nch)
    if with_flip:
        d = jnp.concatenate([d, d[:, :, ::-1, :]], axis=0)
    coord_bias = None
    if target == "rgb":
        crop = crop.at[..., :3].add(d.astype(crop.dtype))
    else:
        coord_bias = d
    out = forward_for(cfg)(params, cfg, crop, pts, prompt_type=0,
                           coord_bias=coord_bias)
    logits = out["instances"]
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]
    if with_flip:
        probs = 0.5 * (probs[:1] + probs[1:, :, ::-1])
        pos, neg = pos[:1], neg[:1]
    loss, fmax_pos, fmax_neg = brs_mask_loss(probs, pos, neg)
    return loss + reg, (logits, fmax_pos, fmax_neg)


@functools.partial(jax.jit, static_argnames=("cfg", "reg_weight",
                                             "with_flip", "th", "tw",
                                             "target"))
def _input_grad(params, cfg, crop, pts, delta, pos, neg, *,
                reg_weight, with_flip, th, tw, target):
    return jax.value_and_grad(_input_objective, argnums=4, has_aux=True)(
        params, cfg, crop, pts, delta, pos, neg, reg_weight, with_flip,
        th, tw, target)


class InputBRSPredictor(FeatureBRSPredictor):
    """RGB-BRS / DistMap-BRS (brs.py:247-307): L-BFGS over an input
    perturbation; every iteration pays a full forward.

    `optimize_target`: 'rgb' (3-channel image delta) or 'dmaps' (2-channel
    disk-map delta, `__init__.py:76-77` use_dmaps)."""

    _INSERTIONS = ("tokens",)  # unused; kept for ctor compatibility

    def __init__(self, params, cfg: PredictorConfig,
                 optimize_target: str = "rgb", **kw):
        assert optimize_target in ("rgb", "dmaps"), optimize_target
        super().__init__(params, cfg, **kw)
        self.optimize_target = optimize_target

    def _optimize_round(self, st) -> float:
        """L-BFGS over the input perturbation (delta reset per click —
        brs.py:257), then the final perturbed forward."""
        cfg = self.cfg
        points = st.points
        roi, has_roi = _update_roi(cfg, st, points)
        roi_t = (roi[0], roi[1], roi[2], roi[3])
        th, tw = cfg.target_size
        net_in = jnp.concatenate([st.image, st.prev_probs], axis=-1)
        crop = roi_crop_resize(net_in, roi_t, th, tw)
        if cfg.with_flip:
            crop = jnp.concatenate([crop, crop[:, :, ::-1, :]], axis=0)
        pts = _transform_points(points, roi, (th, tw), cfg.with_flip)
        pos, neg = click_maps(pts, th, tw)

        nch = 3 if self.optimize_target == "rgb" else 2
        delta0 = np.zeros((th * tw * nch,), np.float64)
        best = {"loss": np.inf, "x": delta0.copy()}
        kwargs = dict(reg_weight=self.reg_weight, with_flip=cfg.with_flip,
                      th=th, tw=tw, target=self.optimize_target)

        def functor(x):
            xj = jnp.asarray(x, jnp.float32)
            (loss, (logits, fp_, fn_)), grad = _input_grad(
                self.params, cfg.model, crop, pts, xj, pos, neg, **kwargs)
            f_val = float(loss)
            if f_val < best["loss"]:
                best["loss"] = f_val
                best["x"] = np.asarray(x, np.float64).copy()
            if float(fp_) < (1 - cfg.prob_thresh) and \
                    float(fn_) < cfg.prob_thresh:
                return f_val, np.zeros_like(np.asarray(x))
            return f_val, np.asarray(grad, np.float64).ravel()

        if int(st.click_count) >= self.optimize_after_n_clicks:
            fmin_l_bfgs_b(func=functor, x0=delta0, m=20, factr=0,
                          pgtol=1e-8, maxfun=self.max_iters)

        xbest = jnp.asarray(best["x"], jnp.float32)
        (_, (logits, _, _)), _ = _input_grad(
            self.params, cfg.model, crop, pts, xbest, pos, neg, **kwargs)
        if cfg.with_flip:
            logits = 0.5 * (logits[:1] + logits[1:, :, ::-1, :])
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        hc, wc = st.gt.shape
        canvas = roi_paste_back(probs, roi_t, hc, wc)
        st = st._replace(prev_probs=canvas, roi=roi, has_roi=has_roi)
        self.state = st

        pm = np.asarray(canvas[0, :, :, 0]) > cfg.prob_thresh
        gt = np.asarray(st.gt)
        inter = np.logical_and(pm, gt == 1)[gt != -1].sum()
        union = np.logical_or(pm, gt == 1)[gt != -1].sum()
        return float(inter / max(union, 1))


def get_predictor(params, cfg: PredictorConfig, brs_mode: str = "NoBRS",
                  int8: bool = False, **brs_kwargs):
    """predictors/__init__.py:9-99 equivalent factory — all six reference
    modes: NoBRS, f-BRS-A/B/C, RGB-BRS, DistMap-BRS.

    f-BRS dispatch mirrors the reference: HRNet models get the
    HRNetFeatureBRSPredictor insertion remap A/A/C (`__init__.py:64-66`),
    DeepLab models get after_c4/after_aspp/after_deeplab
    (`__init__.py:53-57`); VPU models use the tokens/neck/head remap
    (PARITY.md deviation #9)."""
    from .predictor import Predictor
    from ..models.vpu import VPUConfig
    from ..models.zoo.hrnet import HRNetISConfig
    from ..models.zoo.deeplab import DeeplabISConfig
    mode = brs_mode.lower()
    if mode == "nobrs":
        return Predictor(params, cfg, int8=int8)
    assert not int8, ("int8 PTQ is NoBRS-only: BRS optimizes through the "
                      "forward's gradient, which int8 rounding destroys")
    letter = {"f-brs-a": "a", "f-brs": "a", "f-brs-b": "b",
              "f-brs-c": "c"}.get(mode)
    if letter is not None:
        m = cfg.model
        if isinstance(m, HRNetISConfig):
            insertion = {"a": "A", "b": "A", "c": "C"}[letter]
        elif isinstance(m, DeeplabISConfig):
            insertion = {"a": "after_c4", "b": "after_aspp",
                         "c": "after_deeplab"}[letter]
        elif isinstance(m, VPUConfig):
            insertion = {"a": "tokens", "b": "neck", "c": "head"}[letter]
        else:
            raise ValueError(
                f"f-BRS has no insertion map for {type(m).__name__} "
                f"(reference supports DeepLab/HRNet only; VPU added here) "
                f"— use NoBRS, RGB-BRS or DistMap-BRS")
        brs_kwargs.setdefault("insertion", insertion)
        klass = FeatureBRSPredictor if isinstance(m, VPUConfig) \
            else ZooFeatureBRSPredictor
        return klass(params, cfg, **brs_kwargs)
    if mode in ("rgb-brs", "input-brs", "distmap-brs"):
        brs_kwargs.setdefault(
            "optimize_target", "dmaps" if mode == "distmap-brs" else "rgb")
        return InputBRSPredictor(params, cfg, **brs_kwargs)
    raise ValueError(f"unknown BRS mode {brs_mode!r}")
