"""Independent numpy re-statement of the reference semantics, used as a test
oracle for the vectorized JAX ops.

These are straight transliterations of the *mathematical contract* documented
in SURVEY.md §2.7/2.10/2.11 (reference files CenterNet/utils/{gaussian,losses,
decode}.py) into plain numpy host loops. They exist only under tests/.
"""

import math

import numpy as np


def gaussian_radius_np(det_size, min_overlap=0.7):
    height, width = det_size
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = math.sqrt(b1 ** 2 - 4 * c1)
    r1 = (b1 + sq1) / 2

    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = math.sqrt(b2 ** 2 - 4 * 4 * c2)
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = math.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


def gaussian2d_np(shape, sigma=1.0):
    m, n = [(ss - 1.0) / 2.0 for ss in shape]
    y, x = np.ogrid[-m : m + 1, -n : n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(np.float32).eps * h.max()] = 0
    return h.astype(np.float32)


def draw_umich_gaussian_np(heatmap, center, radius, k=1):
    diameter = 2 * radius + 1
    gaussian = gaussian2d_np((diameter, diameter), sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[0:2]
    left, right = int(min(x, radius)), int(min(width - x, radius + 1))
    top, bottom = int(min(y, radius)), int(min(height - y, radius + 1))
    masked_heatmap = heatmap[y - top : y + bottom, x - left : x + right]
    masked_gaussian = gaussian[
        radius - top : radius + bottom, radius - left : radius + right
    ]
    if min(masked_gaussian.shape) > 0 and min(masked_heatmap.shape) > 0:
        np.maximum(masked_heatmap, masked_gaussian * k, out=masked_heatmap)
    return heatmap


def draw_msra_gaussian_np(heatmap, center, sigma):
    tmp_size = sigma * 3
    mu_x = int(center[0] + 0.5)
    mu_y = int(center[1] + 0.5)
    w, h = heatmap.shape[0], heatmap.shape[1]
    ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
    br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
    if br[0] >= h or br[1] >= w or ul[0] < 0 or ul[1] < 0:
        return heatmap
    size = 2 * tmp_size + 1
    x = np.arange(0, size, 1, np.float32)
    y = x[:, np.newaxis]
    x0 = y0 = size // 2
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
    g_x = max(0, -ul[0]), min(br[0], h) - ul[0]
    g_y = max(0, -ul[1]), min(br[1], w) - ul[1]
    img_x = max(0, ul[0]), min(br[0], h)
    img_y = max(0, ul[1]), min(br[1], w)
    heatmap[img_y[0] : img_y[1], img_x[0] : img_x[1]] = np.maximum(
        heatmap[img_y[0] : img_y[1], img_x[0] : img_x[1]],
        g[g_y[0] : g_y[1], g_x[0] : g_x[1]],
    )
    return heatmap


def focal_loss_np(pred, gt):
    pos = (gt == 1).astype(np.float64)
    neg = (gt < 1).astype(np.float64)
    neg_w = (1 - gt) ** 4
    pos_loss = (np.log(pred) * (1 - pred) ** 2 * pos).sum()
    neg_loss = (np.log(1 - pred) * pred ** 2 * neg_w * neg).sum()
    num_pos = pos.sum()
    if num_pos == 0:
        return -neg_loss
    return -(pos_loss + neg_loss) / num_pos


def nms_np(heat):
    """3x3 max-pool pseudo-NMS on [B, H, W, C]."""
    b, h, w, c = heat.shape
    padded = np.pad(
        heat, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-np.inf
    )
    hmax = np.full_like(heat, -np.inf)
    for dy in range(3):
        for dx in range(3):
            hmax = np.maximum(hmax, padded[:, dy : dy + h, dx : dx + w])
    return heat * (hmax == heat)


def topk_np(scores, k):
    """Reference _topk on [B, H, W, C]; returns (score, inds, clses, ys, xs)."""
    b, h, w, c = scores.shape
    flat = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    # stable descending per class
    order = np.argsort(-flat, axis=2, kind="stable")[:, :, :k]
    cls_scores = np.take_along_axis(flat, order, axis=2)
    cls_inds = order
    all_scores = cls_scores.reshape(b, c * k)
    gorder = np.argsort(-all_scores, axis=1, kind="stable")[:, :k]
    top_scores = np.take_along_axis(all_scores, gorder, axis=1)
    clses = gorder // k
    inds = np.take_along_axis(cls_inds.reshape(b, c * k), gorder, axis=1)
    ys = (inds // w).astype(np.float32)
    xs = (inds % w).astype(np.float32)
    return top_scores, inds, clses, ys, xs


def ctdet_decode_np(heat, wh, reg, k=100):
    """Reference ctdet_decode on NHWC numpy arrays."""
    b, h, w, c = heat.shape
    heat = nms_np(heat)
    scores, inds, clses, ys, xs = topk_np(heat, k)
    whf = wh.reshape(b, h * w, 2)
    regf = reg.reshape(b, h * w, 2)
    wh_g = np.take_along_axis(whf, inds[..., None], axis=1)
    reg_g = np.take_along_axis(regf, inds[..., None], axis=1)
    xs = xs[..., None] + reg_g[..., 0:1]
    ys = ys[..., None] + reg_g[..., 1:2]
    boxes = np.concatenate(
        [
            xs - wh_g[..., 0:1] / 2,
            ys - wh_g[..., 1:2] / 2,
            xs + wh_g[..., 0:1] / 2,
            ys + wh_g[..., 1:2] / 2,
        ],
        axis=2,
    )
    return np.concatenate(
        [boxes, scores[..., None], clses[..., None].astype(np.float32)], axis=2
    )
