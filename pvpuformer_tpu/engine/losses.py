"""Training losses — pure jittable functions.

Re-derivations of the reference loss zoo (`isegm/model/losses.py`) with the
same math, reductions and epsilons, adapted to NHWC activations:

  * normalized_focal_loss   = NormalizedFocalLossSigmoid (losses.py:11-85)
  * focal_loss              = FocalLoss (losses.py:92-133)
  * soft_iou_loss           = SoftIoU (losses.py:136-152)
  * sigmoid_bce_loss        = SigmoidBinaryCrossEntropyLoss (losses.py:155-176)
  * boundary_bce_loss       = BoundaryCrossEntropyLoss (losses.py:179-213),
                              with the cv2 L1 distance-transform boundary
                              replaced by an equivalent on-device 4-neighbor
                              erosion test (DIST_L1 == 1 <=> in-mask pixel with
                              a 4-adjacent background pixel; image borders are
                              NOT background — cv2 applies no padding there)
  * dice_loss               = DiceLoss/dice_loss (losses.py:227-363)
  * error_count             = ErrorCount (losses.py:216-224)

Shapes: predictions/labels are (B, H, W, C); every loss returns a per-sample
(B,) vector like the reference (the trainer means it), except where noted.
The reference's host-side EMA diagnostics (`_k_sum`/`_m_max`) are returned as
an aux dict so a host-side logger can maintain the EMAs functionally.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


def _sum_non_batch(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def normalized_focal_loss(pred_logits: jnp.ndarray, label: jnp.ndarray,
                          alpha: float = 0.5, gamma: float = 2.0,
                          eps: float = 1e-12, max_mult: float = -1.0,
                          detach_delimeter: bool = True,
                          from_sigmoid: bool = False,
                          ignore_label: float = -1.0,
                          with_aux: bool = False):
    """NormalizedFocalLossSigmoid (losses.py:40-85). Shipped config uses
    alpha=0.5, gamma=2 (vpu_base448_cocolvis.py:74)."""
    pred_logits = pred_logits.astype(jnp.float32)
    label = label.astype(jnp.float32)
    one_hot = label > 0.5
    sw = (label != ignore_label).astype(jnp.float32)
    pred = pred_logits if from_sigmoid else jax.nn.sigmoid(pred_logits)

    a = jnp.where(one_hot, alpha * sw, (1.0 - alpha) * sw)
    pt = jnp.where(sw > 0, 1.0 - jnp.abs(label - pred), 1.0)
    beta = (1.0 - pt) ** gamma

    # normalization over the spatial dims (torch dims (-2,-1) on NCHW == (H,W))
    sw_sum = jnp.sum(sw, axis=(1, 2), keepdims=True)
    beta_sum = jnp.sum(beta, axis=(1, 2), keepdims=True)
    mult = sw_sum / (beta_sum + eps)
    if detach_delimeter:
        mult = jax.lax.stop_gradient(mult)
    beta = beta * mult
    if max_mult > 0:
        beta = jnp.minimum(beta, max_mult)

    loss = -a * beta * jnp.log(jnp.minimum(pt + eps, 1.0))
    loss = loss * sw
    bsum = _sum_non_batch(sw)
    loss = _sum_non_batch(loss) / (bsum + eps)

    if not with_aux:
        return loss
    # diagnostics for the reference's _k_sum/_m_max EMAs (losses.py:63-71)
    ignore_area = _sum_non_batch((label == ignore_label).astype(jnp.float32))
    aux = {
        "sample_mult": jnp.mean(mult, axis=tuple(range(1, mult.ndim))),
        "beta_pmax": jnp.max(beta.reshape(beta.shape[0], -1), axis=1),
        "no_ignore": ignore_area == 0,
    }
    return loss, aux


def focal_loss(pred_logits: jnp.ndarray, label: jnp.ndarray,
               alpha: float = 0.25, gamma: float = 2.0, eps: float = 1e-9,
               scale: float = 1.0, from_logits: bool = False,
               ignore_label: float = -1.0) -> jnp.ndarray:
    """FocalLoss (losses.py:112-133)."""
    pred_logits = pred_logits.astype(jnp.float32)
    label = label.astype(jnp.float32)
    one_hot = label > 0.5
    sw = (label != ignore_label).astype(jnp.float32)
    pred = pred_logits if from_logits else jax.nn.sigmoid(pred_logits)

    a = jnp.where(one_hot, alpha * sw, (1.0 - alpha) * sw)
    pt = jnp.where(sw > 0, 1.0 - jnp.abs(label - pred), 1.0)
    beta = (1.0 - pt) ** gamma
    loss = -a * beta * jnp.log(jnp.minimum(pt + eps, 1.0)) * sw
    tsum = _sum_non_batch(sw)
    return scale * _sum_non_batch(loss) / (tsum + eps)


def soft_iou_loss(pred: jnp.ndarray, label: jnp.ndarray,
                  from_sigmoid: bool = False,
                  ignore_label: float = -1.0) -> jnp.ndarray:
    """SoftIoU (losses.py:142-152)."""
    pred = pred.astype(jnp.float32)
    label = label.astype(jnp.float32).reshape(pred.shape)
    sw = (label != ignore_label).astype(jnp.float32)
    if not from_sigmoid:
        pred = jax.nn.sigmoid(pred)
    inter = _sum_non_batch(pred * label * sw)
    union = _sum_non_batch(jnp.maximum(pred, label) * sw)
    return 1.0 - inter / (union + 1e-8)


def sigmoid_bce_loss(pred: jnp.ndarray, label: jnp.ndarray,
                     from_sigmoid: bool = False,
                     ignore_label: float = -1.0) -> jnp.ndarray:
    """SigmoidBinaryCrossEntropyLoss (losses.py:163-176). The shipped config
    uses from_sigmoid=True for the P2CL aux3 loss (vpu_base448_cocolvis.py:79)."""
    pred = pred.astype(jnp.float32)
    label = label.astype(jnp.float32).reshape(pred.shape)
    sw = (label != ignore_label).astype(jnp.float32)
    label = jnp.where(sw > 0, label, 0.0)
    if not from_sigmoid:
        loss = jnp.maximum(pred, 0.0) - pred * label + \
            jax.nn.softplus(-jnp.abs(pred))
    else:
        eps = 1e-12
        loss = -(jnp.log(pred + eps) * label
                 + jnp.log(1.0 - pred + eps) * (1.0 - label))
    loss = loss * sw
    return jnp.mean(loss.reshape(loss.shape[0], -1), axis=1)


def dice_loss(pred_logits: jnp.ndarray, target: jnp.ndarray,
              use_sigmoid: bool = True, naive_dice: bool = True,
              eps: float = 1e-3, loss_weight: float = 1.0) -> jnp.ndarray:
    """DiceLoss (losses.py:227-363), reduction='none' per-sample form; the
    shipped config uses use_sigmoid=True, naive_dice=True
    (vpu_base448_cocolvis.py:76)."""
    pred = pred_logits.astype(jnp.float32)
    if use_sigmoid:
        pred = jax.nn.sigmoid(pred)
    b = pred.shape[0]
    p = pred.reshape(b, -1)
    t = target.astype(jnp.float32).reshape(b, -1)
    a = jnp.sum(p * t, axis=1)
    if naive_dice:
        d = (2.0 * a + eps) / (jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + eps)
    else:
        d = 2.0 * a / (jnp.sum(p * p, axis=1) + jnp.sum(t * t, axis=1) + eps)
    return loss_weight * (1.0 - d)


def _inner_boundary(mask: jnp.ndarray) -> jnp.ndarray:
    """Pixels of `mask` with a 4-adjacent background pixel; image borders are
    not background (== cv2.distanceTransform(mask, DIST_L1, 3) == 1 on the
    un-padded array, losses.py:194-195). mask: (..., H, W) bool."""
    m = mask
    pad = [(0, 0)] * (m.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(m, pad, mode="edge")
    up = p[..., :-2, 1:-1]
    dn = p[..., 2:, 1:-1]
    lf = p[..., 1:-1, :-2]
    rt = p[..., 1:-1, 2:]
    has_bg_neighbor = ~(up & dn & lf & rt)
    return m & has_bg_neighbor


def boundary_bce_loss(gt: jnp.ndarray, pred_logits: jnp.ndarray) -> jnp.ndarray:
    """BoundaryCrossEntropyLoss (losses.py:183-213): BCE-with-logits summed
    over the positive and negative GT boundary bands, each normalized by the
    total element count. gt/pred: (B, H, W, 1). Returns a scalar."""
    gtf = gt.astype(jnp.float32)
    gmask = gtf[..., 0] > 0.5                       # (B, H, W)
    b_pos = _inner_boundary(gmask)[..., None]
    b_neg = _inner_boundary(~gmask)[..., None]

    x = pred_logits.astype(jnp.float32)
    bce = jnp.maximum(x, 0.0) - x * gtf + jax.nn.softplus(-jnp.abs(x))
    size = float(gtf.size)
    loss_pos = jnp.sum(jnp.where(b_pos, bce, 0.0)) / size
    loss_neg = jnp.sum(jnp.where(b_neg, bce, 0.0)) / size
    return loss_pos + loss_neg


def error_count(gt: jnp.ndarray, pred_logits: jnp.ndarray,
                pred_thresh: float = 0.49) -> jnp.ndarray:
    """ErrorCount diagnostic (losses.py:216-224): fraction of mispredicted
    pixels. Returns a scalar."""
    pred = jax.nn.sigmoid(pred_logits.astype(jnp.float32)) > pred_thresh
    diff = (gt.astype(jnp.float32) > 0.5) != pred
    return jnp.sum(diff) / float(gt.size)


def cross_entropy_loss(pred_logits: jnp.ndarray, label: jnp.ndarray,
                       ignore_index: int = 255,
                       class_weight=None) -> jnp.ndarray:
    """mmseg-style multi-class CE (transformer_helper/cross_entropy_loss.py:
    199): pred (B, H, W, C) logits, label (B, H, W) int class ids,
    `ignore_index` pixels dropped; mean over valid pixels."""
    pred = pred_logits.astype(jnp.float32)
    c = pred.shape[-1]
    valid = label != ignore_index
    lab = jnp.where(valid, label, 0)
    logp = jax.nn.log_softmax(pred, axis=-1)
    nll = -jnp.take_along_axis(logp, lab[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if class_weight is not None:
        w = jnp.asarray(class_weight, jnp.float32)[lab]
        nll = nll * w
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def accuracy(pred_logits: jnp.ndarray, label: jnp.ndarray,
             ignore_index: int = 255) -> jnp.ndarray:
    """mmseg `accuracy` (transformer_helper/accuracy.py): top-1 pixel
    accuracy over non-ignored pixels, in percent."""
    pred = jnp.argmax(pred_logits, axis=-1)
    valid = label != ignore_index
    correct = (pred == label) & valid
    return 100.0 * jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)
