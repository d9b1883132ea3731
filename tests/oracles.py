"""Trusted numpy oracles: independent reimplementations of the reference
formulas (cited by file:line) used to validate the on-device kernels.

These deliberately mirror the reference's host-loop style so that any
vectorization mistake in the JAX kernels shows up as a mismatch.
"""
import numpy as np


# --- DistMaps GPU math (isegm/model/ops.py:347-377) ------------------------

def disk_maps_oracle(points, rows, cols, norm_radius=5.0, spatial_scale=1.0,
                     use_disks=True):
    b, twon, _ = points.shape
    n = twon // 2
    out = np.zeros((b, 2, rows, cols), np.float32)
    yy, xx = np.meshgrid(np.arange(rows, dtype=np.float32),
                         np.arange(cols, dtype=np.float32), indexing="ij")
    for bi in range(b):
        for half in range(2):
            d2 = np.full((rows, cols), 1e6, np.float32)
            for pi in range(n):
                p = points[bi, half * n + pi]
                if max(p[0], p[1]) < 0:
                    continue
                dy = yy - p[0] * spatial_scale
                dx = xx - p[1] * spatial_scale
                if not use_disks:
                    dy = dy / (norm_radius * spatial_scale)
                    dx = dx / (norm_radius * spatial_scale)
                d2 = np.minimum(d2, dy * dy + dx * dx)
            out[bi, half] = d2
    if use_disks:
        out = (out <= (norm_radius * spatial_scale) ** 2).astype(np.float32)
    else:
        out = np.tanh(2.0 * np.sqrt(out))
    return out.transpose(0, 2, 3, 1)


# --- PPuE click vectors (isegm/model/ops.py:39-104, is_vpu_model.py:189-230)

def _in_img(x, y, w, h):
    return not ((x < 0) or (x > w) or (y < 0) or (y > h))


def _gauss_clip(sigma, heighten):
    radius = int(sigma * 3)
    size = 2 * radius + 1
    center = size // 2
    g = np.arange(size, dtype=np.float32)
    g = np.exp(-((g - center) ** 2) / (2 * sigma ** 2))
    if heighten:
        g[center] += 1
    return g, radius


def click_vector_oracle(pt_yx, out_w, out_h, sigma=3.0, heighten=True,
                        scale=1.0):
    """One (y, x) click -> (profile0[out_w], profile1[out_h])."""
    g, radius = _gauss_clip(sigma, heighten)
    lm = (np.asarray(pt_yx, np.float64) * scale).astype("int32")
    a, b = int(lm[0]), int(lm[1])   # reference: x, y = lmks[0], lmks[1]
    v0 = np.zeros(out_w, np.float32)
    v1 = np.zeros(out_h, np.float32)
    ul = [a - radius, b - radius]
    br = [a + radius + 1, b + radius + 1]
    if (not _in_img(ul[0], ul[1], out_w, out_h)) and \
       (not _in_img(br[0], br[1], out_w, out_h)):
        return v0, v1
    g_x = max(0, -ul[0]), min(out_w, br[0]) - ul[0]
    g_y = max(0, -ul[1]), min(out_h, br[1]) - ul[1]
    img_x = max(0, ul[0]), min(out_w, br[0])
    img_y = max(0, ul[1]), min(out_h, br[1])
    v0[img_x[0]:img_x[1]] = g[g_x[0]:g_x[1]]
    v1[img_y[0]:img_y[1]] = g[g_y[0]:g_y[1]]
    return v0, v1


def ppue_click_oracle(points, out_w, out_h, num_max_points=None):
    """Full (B, 2N, 3) -> (B, 2*nmax, out_w+out_h+3) per is_vpu_model.py:189-230."""
    b, twon, _ = points.shape
    n = twon // 2
    nmax = num_max_points or n
    dim = out_w + out_h + 3
    nap = np.zeros(dim, np.float32)
    nap[-1] = 1.0

    rows = np.zeros((b, twon, dim), np.float32)
    for bi in range(b):
        for pi in range(twon):
            v0, v1 = click_vector_oracle(points[bi, pi, :2], out_w, out_h)
            lbl = np.zeros(3, np.float32)
            lbl[0 if pi < n else 1] = 1.0
            rows[bi, pi] = np.concatenate([v0, v1, lbl])
            if points[bi, pi, 2] == -1:
                rows[bi, pi] = nap
    if nmax != n:
        pad = np.broadcast_to(nap, (b, nmax - n, dim))
        rows = np.concatenate([rows[:, :n], pad, rows[:, n:], pad], axis=1)
    return rows


# --- PPuE box vector (isegm/model/ops.py:107-202) ---------------------------

def box_vector_oracle(box_xywh, out_w, out_h, scale=1.0):
    """(x_c, y_c, w, h) -> (profile0[out_w], profile1[out_h])."""
    xc, yc, bw, bh = [float(v) for v in box_xywh]
    v0 = np.zeros(out_w, np.float32)
    v1 = np.zeros(out_h, np.float32)
    if xc + yc + bw + bh == 0:
        return v0, v1
    kw = int(bw) // 2 * 2 - 1
    radius_w = (kw - 1) // 2
    sigma_w = radius_w // 3
    if sigma_w == 0:
        return v0, v1
    gw = np.arange(kw, dtype=np.float32)
    gw = np.exp(-((gw - kw // 2) ** 2) / (2 * sigma_w ** 2))
    kh = int(bh) // 2 * 2 - 1
    radius_h = (kh - 1) // 2
    sigma_h = radius_h // 3
    if sigma_h == 0:
        return v0, v1
    gh = np.arange(kh, dtype=np.float32)
    gh = np.exp(-((gh - kh // 2) ** 2) / (2 * sigma_h ** 2))

    lm = (np.array([xc, yc]) * scale).astype("int32")
    x, y = int(lm[0]), int(lm[1])
    ul = [x - radius_w, y - radius_h]
    br = [x + radius_w + 1, y + radius_h + 1]
    if (not _in_img(ul[0], ul[1], out_w, out_h)) and \
       (not _in_img(br[0], br[1], out_w, out_h)):
        return v0, v1
    g_x = max(0, -ul[0]), min(out_w, br[0]) - ul[0]
    g_y = max(0, -ul[1]), min(out_h, br[1]) - ul[1]
    img_x = max(0, ul[0]), min(out_w, br[0])
    img_y = max(0, ul[1]), min(out_h, br[1])
    v0[img_x[0]:img_x[1]] = gw[g_x[0]:g_x[1]]
    v1[img_y[0]:img_y[1]] = gh[g_y[0]:g_y[1]]
    return v0, v1
