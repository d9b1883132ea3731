"""Losses vs torch oracles implementing the reference formulas
(isegm/model/losses.py) verbatim."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from pvpuformer_tpu.engine import losses as L


def rng(seed=0):
    return np.random.default_rng(seed)


def make_pair(seed=0, b=3, h=17, w=19, c=1, with_ignore=True):
    r = rng(seed)
    pred = r.normal(0, 2, size=(b, h, w, c)).astype(np.float32)
    label = (r.uniform(size=(b, h, w, c)) > 0.6).astype(np.float32)
    if with_ignore:
        label[r.uniform(size=label.shape) > 0.9] = -1.0
    return pred, label


def to_torch_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


# ------------------------------------------------------------- torch oracles

def nfl_oracle(pred, label, alpha=0.5, gamma=2, eps=1e-12, ignore=-1):
    """NormalizedFocalLossSigmoid.forward (losses.py:40-85)."""
    pred, label = to_torch_nchw(pred), to_torch_nchw(label)
    one_hot = label > 0.5
    sw = (label != ignore).float()
    p = torch.sigmoid(pred)
    a = torch.where(one_hot, alpha * sw, (1 - alpha) * sw)
    pt = torch.where(sw.bool(), 1.0 - torch.abs(label - p),
                     torch.ones_like(p))
    beta = (1 - pt) ** gamma
    sw_sum = torch.sum(sw, dim=(-2, -1), keepdim=True)
    beta_sum = torch.sum(beta, dim=(-2, -1), keepdim=True)
    mult = (sw_sum / (beta_sum + eps)).detach()
    beta = beta * mult
    loss = -a * beta * torch.log(torch.clamp_max(pt + eps, 1.0))
    loss = loss * sw
    dims = tuple(range(1, loss.dim()))
    bsum = torch.sum(sw, dim=dims)
    return (torch.sum(loss, dim=dims) / (bsum + eps)).numpy()


def focal_oracle(pred, label, alpha=0.25, gamma=2, eps=1e-9, ignore=-1):
    pred, label = to_torch_nchw(pred), to_torch_nchw(label)
    one_hot = label > 0.5
    sw = (label != ignore).float()
    p = torch.sigmoid(pred)
    a = torch.where(one_hot, alpha * sw, (1 - alpha) * sw)
    pt = torch.where(sw.bool(), 1.0 - torch.abs(label - p),
                     torch.ones_like(p))
    beta = (1 - pt) ** gamma
    loss = -a * beta * torch.log(torch.clamp_max(pt + eps, 1.0)) * sw
    dims = tuple(range(1, loss.dim()))
    return (torch.sum(loss, dim=dims) / (torch.sum(sw, dim=dims) + eps)).numpy()


def bce_oracle(pred, label, from_sigmoid, ignore=-1):
    pred, label = to_torch_nchw(pred), to_torch_nchw(label)
    sw = (label != ignore).float()
    label = torch.where(sw.bool(), label, torch.zeros_like(label))
    if not from_sigmoid:
        loss = torch.relu(pred) - pred * label + F.softplus(-torch.abs(pred))
    else:
        eps = 1e-12
        loss = -(torch.log(pred + eps) * label
                 + torch.log(1 - pred + eps) * (1 - label))
    loss = loss * sw
    return torch.mean(loss, dim=tuple(range(1, loss.dim()))).numpy()


def dice_oracle(pred, target, naive, eps=1e-3):
    pred, target = to_torch_nchw(pred), to_torch_nchw(target)
    p = torch.sigmoid(pred).flatten(1)
    t = target.flatten(1).float()
    a = torch.sum(p * t, 1)
    if naive:
        d = (2 * a + eps) / (torch.sum(p, 1) + torch.sum(t, 1) + eps)
    else:
        d = 2 * a / (torch.sum(p * p, 1) + eps + torch.sum(t * t, 1) + eps)
    return (1 - d).numpy()


def soft_iou_oracle(pred, label, ignore=-1):
    pred, label = to_torch_nchw(pred), to_torch_nchw(label)
    sw = (label != ignore).float()
    p = torch.sigmoid(pred)
    return (1.0 - torch.sum(p * label * sw, dim=(1, 2, 3))
            / (torch.sum(torch.max(p, label) * sw, dim=(1, 2, 3)) + 1e-8)).numpy()


def boundary_oracle(gt, pred):
    """BoundaryCrossEntropyLoss.forward (losses.py:183-213) with cv2."""
    import cv2
    gt_t, pred_t = to_torch_nchw(gt), to_torch_nchw(pred)
    gt_arr = (gt_t.numpy()[:, 0] > 0.5).astype(np.uint8)
    dts_pos, dts_neg = [], []
    for bindex in range(len(gt_arr)):
        pos = gt_arr[bindex]
        neg = (gt_arr[bindex] == 0).astype(np.uint8)
        dts_pos.append([cv2.distanceTransform(pos, cv2.DIST_L1, 3) == 1])
        dts_neg.append([cv2.distanceTransform(neg, cv2.DIST_L1, 3) == 1])
    dts_pos = torch.tensor(np.array(dts_pos))
    dts_neg = torch.tensor(np.array(dts_neg))
    size = np.prod(gt_t.size())
    lp = F.binary_cross_entropy_with_logits(
        pred_t[dts_pos], gt_t[dts_pos], reduction="sum") / size
    ln = F.binary_cross_entropy_with_logits(
        pred_t[dts_neg], gt_t[dts_neg], reduction="sum") / size
    return float(lp + ln)


# --------------------------------------------------------------------- tests

def test_normalized_focal_loss():
    pred, label = make_pair(1)
    ours = np.asarray(L.normalized_focal_loss(jnp.asarray(pred),
                                              jnp.asarray(label)))
    np.testing.assert_allclose(ours, nfl_oracle(pred, label), rtol=1e-5,
                               atol=1e-6)


def test_normalized_focal_loss_aux():
    pred, label = make_pair(2, with_ignore=False)
    _, aux = L.normalized_focal_loss(jnp.asarray(pred), jnp.asarray(label),
                                     with_aux=True)
    assert bool(np.all(np.asarray(aux["no_ignore"])))
    assert aux["sample_mult"].shape == (3,)


def test_focal_loss():
    pred, label = make_pair(3)
    ours = np.asarray(L.focal_loss(jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(ours, focal_oracle(pred, label), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("from_sigmoid", [False, True])
def test_sigmoid_bce(from_sigmoid):
    pred, label = make_pair(4, c=6)
    if from_sigmoid:
        pred = 1.0 / (1.0 + np.exp(-pred))
    ours = np.asarray(L.sigmoid_bce_loss(jnp.asarray(pred), jnp.asarray(label),
                                         from_sigmoid=from_sigmoid))
    np.testing.assert_allclose(ours, bce_oracle(pred, label, from_sigmoid),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("naive", [True, False])
def test_dice(naive):
    pred, label = make_pair(5, with_ignore=False)
    ours = np.asarray(L.dice_loss(jnp.asarray(pred), jnp.asarray(label),
                                  naive_dice=naive))
    np.testing.assert_allclose(ours, dice_oracle(pred, label, naive),
                               rtol=1e-5, atol=1e-6)


def test_soft_iou():
    pred, label = make_pair(6)
    ours = np.asarray(L.soft_iou_loss(jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(ours, soft_iou_oracle(pred, label), rtol=1e-5,
                               atol=1e-6)


def test_boundary_bce():
    r = rng(7)
    pred = r.normal(0, 2, size=(2, 33, 41, 1)).astype(np.float32)
    # blobby gt, no -1s (reference boundary loss assumes clean binary gt)
    yy, xx = np.mgrid[0:33, 0:41]
    gt = np.stack([((yy - 16) ** 2 + (xx - 20) ** 2 < 100),
                   ((yy - 8) ** 2 + (xx - 30) ** 2 < 36)])[..., None]
    gt = gt.astype(np.float32)
    ours = float(L.boundary_bce_loss(jnp.asarray(gt), jnp.asarray(pred)))
    np.testing.assert_allclose(ours, boundary_oracle(gt, pred), rtol=1e-5)


def test_error_count():
    pred, label = make_pair(8, with_ignore=False)
    ours = float(L.error_count(jnp.asarray(label), jnp.asarray(pred)))
    p = 1.0 / (1.0 + np.exp(-pred)) > 0.49
    ref = np.mean((label > 0.5) != p)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_adaptive_iou_tracks_reference():
    """AdaptiveIoU vs a direct reimplementation of metrics.py:29-84."""
    from pvpuformer_tpu.engine.metrics import AdaptiveIoU

    r = rng(9)
    m = AdaptiveIoU()
    ref_thresh, ref_ema = 0.4, 0.0
    for step in range(5):
        pred = r.normal(0, 2, size=(4, 24, 24, 1)).astype(np.float32)
        gt = (r.uniform(size=(4, 24, 24, 1)) > 0.5).astype(np.float32)
        m.update(pred, gt)

        # reference update
        p = 1.0 / (1.0 + np.exp(-pred))
        gm = gt > 0.5

        def iou_at(t):
            pm = p > t
            inter = np.mean(pm & gm, axis=(1, 2, 3))
            union = np.mean(pm | gm, axis=(1, 2, 3))
            ok = union > 0
            return (inter[ok] / union[ok]).mean()

        best_t, best = ref_thresh, iou_at(ref_thresh)
        for t in (ref_thresh - 0.025, ref_thresh + 0.025):
            v = iou_at(t)
            if v > best:
                best, best_t = v, t
        ref_thresh = 0.99 * ref_thresh + 0.01 * best_t
        ref_ema = 0.9 * ref_ema + 0.1 * best

    np.testing.assert_allclose(m.iou_thresh, ref_thresh, rtol=1e-5)
    np.testing.assert_allclose(m._ema_iou, ref_ema, rtol=1e-4)


def test_adaptive_iou_device_state_matches_host():
    """The jitted AdaptiveIoU update the training loop threads through its
    steps (metrics.adaptive_iou_step) must track the host class exactly,
    including the no-valid-sample skip and the strict-improvement scan
    order (metrics.py:48-61)."""
    from pvpuformer_tpu.engine.metrics import (AdaptiveIoU, adaptive_iou_step,
                                               iou_at_thresholds,
                                               state_thresholds)

    r = rng(11)
    host = AdaptiveIoU()
    state = host.device_state()
    for step in range(6):
        pred = r.normal(0, 2, size=(4, 16, 16, 1)).astype(np.float32)
        if step == 3:      # an all-empty batch must leave both untouched
            gt = np.zeros((4, 16, 16, 1), np.float32)
        else:
            gt = (r.uniform(size=(4, 16, 16, 1)) > 0.5).astype(np.float32)

        thr_host = host.thresholds()
        thr_dev = np.asarray(state_thresholds(state))
        np.testing.assert_allclose(thr_dev, thr_host, rtol=1e-6)

        ious, valid = iou_at_thresholds(jnp.asarray(pred), jnp.asarray(gt),
                                        jnp.asarray(thr_host))
        host.update_from_ious(np.asarray(ious), np.asarray(valid))
        state = adaptive_iou_step(state, ious, valid)

    np.testing.assert_allclose(float(state.iou_thresh), host.iou_thresh,
                               rtol=1e-5)
    np.testing.assert_allclose(float(state.ema_iou), host._ema_iou, rtol=1e-5)
    np.testing.assert_allclose(float(state.epoch_iou_sum),
                               host._epoch_iou_sum, rtol=1e-5)
    assert int(round(float(state.epoch_batch_count))) == \
        host._epoch_batch_count

    # round-trip: ingest_state must land the host exactly on the device state
    host2 = AdaptiveIoU()
    host2.ingest_state(state)
    np.testing.assert_allclose(host2.iou_thresh, float(state.iou_thresh))
    assert host2.get_epoch_value() > 0
