"""KITTI 16-bit flow PNG I/O and Middlebury flow colorization.

Functional equivalents of /root/reference/core/evaluation/flowlib.py
(read_flow_png :107-128, write_flow_png :131-145, flow_to_image :258-296,
compute_color/make_color_wheel :444-540), vectorized with cv2 instead of the
row-by-row pypng loops.

Encoding: uint16 RGB where u = (R - 2^15)/64, v = (G - 2^15)/64, valid = B.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

UNKNOWN_FLOW_THRESH = 1e7


def read_flow_png(flow_file: str) -> np.ndarray:
    """Read a KITTI flow PNG -> [H,W,3] float64 (u, v, valid)."""
    raw = cv2.imread(flow_file, cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise FileNotFoundError(flow_file)
    rgb = raw[:, :, ::-1].astype(np.float64)  # cv2 loads BGR
    flow = np.zeros_like(rgb)
    flow[:, :, 2] = rgb[:, :, 2]
    invalid = rgb[:, :, 2] == 0
    flow[:, :, 0:2] = (rgb[:, :, 0:2] - 2**15) / 64.0
    flow[invalid, 0] = 0
    flow[invalid, 1] = 0
    return flow


def write_flow_png(path: str, flow_u: np.ndarray, flow_v: np.ndarray, valid=None):
    """Write (u, v) flow as a KITTI 16-bit submission PNG
    (core/visualize/flow_utils.py:51-79)."""
    h, w = flow_u.shape
    out = np.ones((h, w, 3), np.float64)
    out[:, :, 0] = np.clip(flow_u * 64.0 + 2**15, 0, 2**16 - 1)
    out[:, :, 1] = np.clip(flow_v * 64.0 + 2**15, 0, 2**16 - 1)
    if valid is not None:
        out[:, :, 2] = valid
    out16 = out.astype(np.uint16)
    cv2.imwrite(path, out16[:, :, ::-1])  # back to BGR for cv2


def make_color_wheel() -> np.ndarray:
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros([ncols, 3])
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(0, RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(0, YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(0, GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(0, CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(0, BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(0, MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


_WHEEL = make_color_wheel()


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    h, w = u.shape
    img = np.zeros([h, w, 3])
    nan_idx = np.isnan(u) | np.isnan(v)
    u = np.where(nan_idx, 0, u)
    v = np.where(nan_idx, 0, v)
    ncols = _WHEEL.shape[0]
    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1) + 1
    k0 = np.floor(fk).astype(int)
    k1 = k0 + 1
    k1[k1 == ncols + 1] = 1
    f = fk - k0
    for i in range(3):
        tmp = _WHEEL[:, i]
        col0 = tmp[k0 - 1] / 255
        col1 = tmp[k1 - 1] / 255
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] *= 0.75
        img[:, :, i] = np.uint8(np.floor(255 * col * (1 - nan_idx)))
    return img


def flow_to_image(flow: np.ndarray, verbose: bool = False) -> np.ndarray:
    """Flow [H,W,2+] -> Middlebury color image uint8 [H,W,3]."""
    u = flow[:, :, 0].copy()
    v = flow[:, :, 1].copy()
    unknown = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (np.abs(v) > UNKNOWN_FLOW_THRESH)
    u[unknown] = 0
    v[unknown] = 0
    rad = np.sqrt(u**2 + v**2)
    maxrad = max(-1, np.max(rad))
    u = u / (maxrad + np.finfo(float).eps)
    v = v / (maxrad + np.finfo(float).eps)
    img = compute_color(u, v)
    img[np.repeat(unknown[:, :, None], 3, axis=2)] = 0
    return np.uint8(img)


def resize_flow(flow: np.ndarray, new_hw) -> np.ndarray:
    """Resize [H,W,2] flow with value rescaling
    (core/visualize/flow_utils.py:82-90)."""
    h, w = flow.shape[:2]
    nh, nw = new_hw
    out = cv2.resize(flow, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out[:, :, 0] *= nw / w
    out[:, :, 1] *= nh / h
    return out
