#!/usr/bin/env python
"""Synthetic multi-plane world with exact GT depth / flow / pose.

Generates KITTI-prepared-format training data (vertically stacked 3-frame
PNGs + calib.txt + train.txt, the layout of data/kitti_prep.py) from scenes
that are geometrically exact: each scene is a textured ground plane plus
floating textured rectangles; every frame is rendered by sampling each
plane's texture through its own plane-to-image homography with z-buffer
compositing, so the three views are pixel-accurate projections of one rigid
world and the photometric objective's optimum is the true geometry.

GT (center-frame depth, center->right / center->left flow, both 6-DoF poses)
is saved per held-out sample for interleaved eval during long training runs
(scripts/train_synth_long.py).
"""

from __future__ import annotations

import os

import numpy as np


def _smooth_texture(rng, h, w, octaves=4):
    """Multi-octave random RGB texture in [0,1] with fine detail (needs cv2).

    The finest octaves are essential: with only smooth blobs the photometric
    objective has weak gradients everywhere (aperture problem) and the flow
    stage diverges -- observed as NaN flows within 50 steps at 256x832.
    """
    import cv2

    img = np.zeros((h, w, 3), np.float32)
    for o in range(octaves):
        s = 2 ** (octaves - o)
        small = rng.rand(max(2, h // s), max(2, w // s), 3).astype(np.float32)
        img += cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR) / (o + 1)
    # surface-attached high-frequency detail (consistent across views: it
    # lives in texture space, not pixel space)
    img += 0.35 * rng.rand(h, w, 3).astype(np.float32)
    img += 0.35 * cv2.resize(
        rng.rand(h // 2, w // 2, 3).astype(np.float32), (w, h),
        interpolation=cv2.INTER_LINEAR,
    )
    img -= img.min()
    img /= img.max() + 1e-6
    return img


def _euler_to_R(rx, ry, rz):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (Rz @ Ry @ Rx).astype(np.float64)


class Plane:
    """Textured world plane: points X with n . X = d (camera-0 frame)."""

    def __init__(self, normal, dist, tex, tex_origin, tex_axes, tex_scale):
        self.n = np.asarray(normal, np.float64)
        self.n /= np.linalg.norm(self.n)
        self.d = float(dist)
        self.tex = tex
        self.origin = np.asarray(tex_origin, np.float64)  # world point of tex (0,0)
        self.axes = np.asarray(tex_axes, np.float64)  # [2,3] world dirs of tex u,v
        self.scale = float(tex_scale)  # world units per texel
        self.bounds = (tex.shape[1], tex.shape[0])  # (u_max, v_max) texels


def render(planes, K, R, t, hw):
    """Render the camera (R, t: world->cam, X_cam = R X + t) over planes.

    Returns (img [H,W,3], depth [H,W]) with z-buffer compositing; pixels
    hitting no plane get depth=inf and black.
    """
    h, w = hw
    Kinv = np.linalg.inv(K)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    rays_px = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3).astype(np.float64)
    # cam-frame ray dirs -> world dirs; cam center in world: C = -R^T t
    dirs = (Kinv @ rays_px.T).T @ R  # world-frame directions (row vecs)
    C = -R.T @ t

    img = np.zeros((h * w, 3), np.float32)
    zbuf = np.full(h * w, np.inf, np.float64)
    for p in planes:
        denom = dirs @ p.n
        lam = (p.d - C @ p.n) / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        X = C[None] + lam[:, None] * dirs  # world hit points
        z_cam = (X @ R.T + t)[:, 2]
        u = ((X - p.origin) @ p.axes[0]) / p.scale
        v = ((X - p.origin) @ p.axes[1]) / p.scale
        ok = (
            (lam > 0)
            & (z_cam > 0.1)
            & (u >= 0)
            & (v >= 0)
            & (u < p.bounds[0] - 1)
            & (v < p.bounds[1] - 1)
            & (z_cam < zbuf)
        )
        ui = np.clip(u[ok].astype(np.int64), 0, p.bounds[0] - 2)
        vi = np.clip(v[ok].astype(np.int64), 0, p.bounds[1] - 2)
        fu = (u[ok] - ui)[:, None].astype(np.float32)
        fv = (v[ok] - vi)[:, None].astype(np.float32)
        t00 = p.tex[vi, ui]
        t01 = p.tex[vi, ui + 1]
        t10 = p.tex[vi + 1, ui]
        t11 = p.tex[vi + 1, ui + 1]
        img[ok] = (1 - fv) * ((1 - fu) * t00 + fu * t01) + fv * ((1 - fu) * t10 + fu * t11)
        zbuf[ok] = z_cam[ok]
    return img.reshape(h, w, 3), zbuf.reshape(h, w)


def make_scene(rng, hw):
    """Random scene: ground plane + 2-3 floating fronto-ish billboards."""
    h, w = hw
    planes = []
    # ground: normal ~(0,-1,0), camera 1.6m above
    gtex = _smooth_texture(rng, 1024, 1024)
    planes.append(
        Plane(
            normal=[0.0, -1.0, 0.0],
            dist=-1.6,
            tex=gtex,
            tex_origin=[-40.0, 1.6, 0.0],
            tex_axes=[[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
            tex_scale=80.0 / 1024,
        )
    )
    # far backdrop wall
    btex = _smooth_texture(rng, 512, 1024)
    zb = 55.0 + 20 * rng.rand()
    planes.append(
        Plane(
            normal=[0.0, 0.0, -1.0],
            dist=-zb,
            tex=btex,
            tex_origin=[-60.0, -25.0, zb],
            tex_axes=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            tex_scale=120.0 / 1024,
        )
    )
    # floating billboards (create parallax + occlusion boundaries)
    for _ in range(rng.randint(2, 4)):
        z0 = 8.0 + 25.0 * rng.rand()
        x0 = (rng.rand() - 0.5) * 0.8 * z0
        y0 = -2.5 * rng.rand()
        size = 2.0 + 4.0 * rng.rand()
        tex = _smooth_texture(rng, 256, 256)
        planes.append(
            Plane(
                normal=[0.0, 0.0, -1.0],
                dist=-z0,
                tex=tex,
                tex_origin=[x0, y0, z0],
                tex_axes=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                tex_scale=size / 256,
            )
        )
    return planes


def make_motion(rng):
    """KITTI-like ego-motion: dominant forward step + small rot/lateral."""
    dt = 0.8 + 0.8 * rng.rand()  # meters per frame
    t_step = np.array([0.05 * rng.randn(), 0.02 * rng.randn(), dt])
    r_step = np.array([0.004 * rng.randn(), 0.01 * rng.randn(), 0.002 * rng.randn()])
    return r_step, t_step


def pose_mats(r_step, t_step, k):
    """world->cam (R, t) after k motion steps (cam0 = identity)."""
    R_step = _euler_to_R(*r_step)
    R = np.eye(3)
    t = np.zeros(3)
    for _ in range(k):
        # new cam pose: X_cam' = R_step (X_cam - t_step)  (camera moves by
        # t_step/R_step in its own frame)
        R, t = R_step @ R, R_step @ (t - t_step)
    return R, t


def relative_pose(Ra, ta, Rb, tb):
    """tgt(a)->src(b) transform: X_b = R X_a + t (matches pose_vec2mat use)."""
    R = Rb @ Ra.T
    t = tb - R @ ta
    return R, t


def rigid_flow_from_depth(depth, K, R, t):
    """Exact flow of the camera-a image under (R,t) to camera-b, [H,W,2]."""
    h, w = depth.shape
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3).astype(np.float64)
    X = (np.linalg.inv(K) @ pix.T).T * depth.reshape(-1, 1)
    Xb = X @ R.T + t
    pb = (K @ Xb.T).T
    pb = pb[:, :2] / np.maximum(pb[:, 2:3], 1e-6)
    flow = pb - pix[:, :2]
    return flow.reshape(h, w, 2).astype(np.float32)


def generate(out_dir, n_train=240, n_eval=8, hw=(256, 832), seed=0):
    """Write a prepared-format dataset + eval GT npz files."""
    import cv2

    h, w = hw
    os.makedirs(os.path.join(out_dir, "scenes"), exist_ok=True)
    eval_dir = os.path.join(out_dir, "eval_gt")
    os.makedirs(eval_dir, exist_ok=True)
    fx = 0.58 * w
    fy = 1.92 * h / 2
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float64)
    with open(os.path.join(out_dir, "calib.txt"), "w") as f:
        f.write(
            f"P_rect_02: {fx} 0.0 {w / 2} 0.0 0.0 {fy} {h / 2} 0.0 0.0 0.0 1.0 0.0\n"
        )

    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n_train + n_eval):
        planes = make_scene(rng, hw)
        r_step, t_step = make_motion(rng)
        frames, depths, mats = [], [], []
        for k in range(3):
            R, t = pose_mats(r_step, t_step, k)
            img, depth = render(planes, K, R, t, hw)
            frames.append(img)
            depths.append(depth)
            mats.append((R, t))
        stack = (np.concatenate(frames, axis=0) * 255).astype(np.uint8)
        is_eval = i >= n_train
        if not is_eval:
            name = f"scenes/{i:06d}.png"
            cv2.imwrite(os.path.join(out_dir, name), stack[..., ::-1])
            lines.append(f"{name} calib.txt\n")
        else:
            j = i - n_train
            # GT for the CENTER frame (index 1)
            Rc, tc = mats[1]
            Rr, tr = mats[2]
            Rl, tl = mats[0]
            R_fwd, t_fwd = relative_pose(Rc, tc, Rr, tr)
            R_bwd, t_bwd = relative_pose(Rc, tc, Rl, tl)
            d_c = depths[1]
            finite = np.isfinite(d_c)
            d_c = np.where(finite, d_c, 1e3)
            np.savez_compressed(
                os.path.join(eval_dir, f"{j:03d}.npz"),
                img_l=(frames[0] * 255).astype(np.uint8),
                img_c=(frames[1] * 255).astype(np.uint8),
                img_r=(frames[2] * 255).astype(np.uint8),
                depth=d_c.astype(np.float32),
                valid=finite,
                flow_fwd=rigid_flow_from_depth(d_c, K, R_fwd, t_fwd),
                flow_bwd=rigid_flow_from_depth(d_c, K, R_bwd, t_bwd),
                R_fwd=R_fwd,
                t_fwd=t_fwd,
                K=K,
            )
    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.writelines(lines)
    print(f"wrote {len(lines)} train stacks + {n_eval} eval GT to {out_dir}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_world")
    ap.add_argument("--n_train", type=int, default=240)
    ap.add_argument("--n_eval", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 832])
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    generate(a.out, a.n_train, a.n_eval, tuple(a.hw), a.seed)
