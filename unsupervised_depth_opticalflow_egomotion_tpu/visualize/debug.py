"""Debug drawing: correspondences and epipolar lines on images.

Equivalents of the reference's Visualizer_debug helpers
(/root/reference/core/visualize/visualizer.py:94-226) used to sanity-check
the geometric estimators.
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.max() <= 1.0:
        img = img * 255
    return np.ascontiguousarray(img.astype(np.uint8))


def draw_correspondences(img1, img2, matches, num: int = 50, seed: int = 0):
    """Side-by-side pair with match lines. matches [N,4] (x1,y1,x2,y2)."""
    img1 = _to_u8(img1)
    img2 = _to_u8(img2)
    h, w = img1.shape[:2]
    canvas = np.concatenate([img1, img2], axis=1)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(matches), size=min(num, len(matches)), replace=False)
    for i in idx:
        x1, y1, x2, y2 = matches[i]
        color = tuple(int(c) for c in rng.randint(0, 255, 3))
        cv2.circle(canvas, (int(x1), int(y1)), 2, color, -1)
        cv2.circle(canvas, (int(x2) + w, int(y2)), 2, color, -1)
        cv2.line(canvas, (int(x1), int(y1)), (int(x2) + w, int(y2)), color, 1)
    return canvas


def draw_epipolar_lines(img1, img2, F, points1, num: int = 20, seed: int = 0):
    """Epipolar lines of points1 (in img1) drawn on img2. F [3,3]."""
    img1 = _to_u8(img1)
    img2 = _to_u8(img2)
    h, w = img2.shape[:2]
    canvas = img2.copy()
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(points1), size=min(num, len(points1)), replace=False)
    for i in idx:
        x, y = points1[i][:2]
        a, b, c = np.asarray(F) @ np.array([x, y, 1.0])
        color = tuple(int(v) for v in rng.randint(0, 255, 3))
        if abs(b) > 1e-9:
            p0 = (0, int(-c / b))
            p1 = (w - 1, int(-(c + a * (w - 1)) / b))
        else:
            p0 = (int(-c / a), 0)
            p1 = (int(-c / a), h - 1)
        cv2.line(canvas, p0, p1, color, 1)
    return canvas


def save_debug_pair(dump_dir, name, canvas):
    os.makedirs(dump_dir, exist_ok=True)
    cv2.imwrite(os.path.join(dump_dir, f"{name}.png"), canvas)
