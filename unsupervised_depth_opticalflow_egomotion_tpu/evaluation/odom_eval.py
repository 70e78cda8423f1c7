"""Full KITTI odometry benchmark scorer + snippet ATE/RE (host-side numpy).

Mirrors /root/reference/core/evaluation/eval_odom.py: per-100m..800m segment
translational/rotational errors after Sim(3) Umeyama alignment, plus the
5-frame-snippet ATE/RE used for the README pose table (test.py:179-194).
Plotting is optional (matplotlib gated).
"""

from __future__ import annotations

import copy
import os

import numpy as np

SEGMENT_LENGTHS = (100, 200, 300, 400, 500, 600, 700, 800)


def scale_lse_solver(X: np.ndarray, Y: np.ndarray) -> float:
    """Least-squares scale s minimizing |s*X - Y|."""
    return np.sum(X * Y) / np.sum(X**2)


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = False):
    """Sim(m) alignment of point sets x, y [m, n] (Umeyama 1991).

    Returns (r, t, c) (eval_odom.py:22-69).
    """
    assert x.shape == y.shape
    m, n = x.shape
    mean_x = x.mean(axis=1)
    mean_y = y.mean(axis=1)
    sigma_x = 1.0 / n * (np.linalg.norm(x - mean_x[:, None]) ** 2)
    cov_xy = (y - mean_y[:, None]) @ (x - mean_x[:, None]).T / n
    u, d, v = np.linalg.svd(cov_xy)
    s = np.eye(m)
    if np.linalg.det(u) * np.linalg.det(v) < 0.0:
        s[m - 1, m - 1] = -1
    r = u @ s @ v
    c = 1 / sigma_x * np.trace(np.diag(d) @ s) if with_scale else 1.0
    t = mean_y - c * (r @ mean_x)
    return r, t, c


def compute_snippet_pose_error(gt: np.ndarray, pred: np.ndarray):
    """Scale-aligned ATE + RE of an N-frame snippet [N,3,4] (test.py:179-194)."""
    snippet_length = gt.shape[0]
    scale_factor = np.sum(gt[:, :, -1] * pred[:, :, -1]) / np.sum(pred[:, :, -1] ** 2)
    ATE = np.linalg.norm((gt[:, :, -1] - scale_factor * pred[:, :, -1]).reshape(-1))
    RE = 0.0
    for gt_pose, pred_pose in zip(gt, pred):
        R = gt_pose[:, :3] @ np.linalg.inv(pred_pose[:, :3])
        s = np.linalg.norm(
            [R[0, 1] - R[1, 0], R[1, 2] - R[2, 1], R[0, 2] - R[2, 0]]
        )
        c = np.trace(R) - 1
        RE += np.arctan2(s, c)
    return ATE / snippet_length, RE / snippet_length


class KittiEvalOdom:
    """Segment-error scorer over full trajectory txt files."""

    def __init__(self):
        self.lengths = list(SEGMENT_LENGTHS)
        self.step_size = 10

    def load_poses(self, file_name: str) -> dict:
        poses = {}
        with open(file_name) as f:
            for cnt, line in enumerate(f.readlines()):
                vals = [float(i) for i in line.split(" ")]
                with_idx = len(vals) == 13
                P = np.eye(4)
                for row in range(3):
                    for col in range(4):
                        P[row, col] = vals[row * 4 + col + with_idx]
                poses[vals[0] if with_idx else cnt] = P
        return poses

    def trajectory_distances(self, poses: dict) -> list:
        dist = [0.0]
        keys = sorted(poses.keys())
        for i in range(len(keys) - 1):
            d = poses[keys[i]][:3, 3] - poses[keys[i + 1]][:3, 3]
            dist.append(dist[i] + float(np.linalg.norm(d)))
        return dist

    @staticmethod
    def rotation_error(pose_error: np.ndarray) -> float:
        d = 0.5 * (np.trace(pose_error[:3, :3]) - 1.0)
        return float(np.arccos(max(min(d, 1.0), -1.0)))

    @staticmethod
    def translation_error(pose_error: np.ndarray) -> float:
        return float(np.linalg.norm(pose_error[:3, 3]))

    def _last_frame(self, dist, first_frame, length):
        for i in range(first_frame, len(dist)):
            if dist[i] > dist[first_frame] + length:
                return i
        return -1

    def calc_sequence_errors(self, poses_gt: dict, poses_result: dict) -> list:
        err = []
        dist = self.trajectory_distances(poses_gt)
        for first_frame in range(0, len(poses_gt), self.step_size):
            for length in self.lengths:
                last_frame = self._last_frame(dist, first_frame, length)
                if (
                    last_frame == -1
                    or last_frame not in poses_result
                    or first_frame not in poses_result
                ):
                    continue
                delta_gt = np.linalg.inv(poses_gt[first_frame]) @ poses_gt[last_frame]
                delta_res = (
                    np.linalg.inv(poses_result[first_frame]) @ poses_result[last_frame]
                )
                pose_error = np.linalg.inv(delta_res) @ delta_gt
                err.append(
                    [
                        first_frame,
                        self.rotation_error(pose_error) / length,
                        self.translation_error(pose_error) / length,
                        length,
                    ]
                )
        return err

    def eval_poses(self, poses_gt: dict, poses_result: dict):
        """Align (first frame + Sim3) and score. Returns (t_err, r_err) in
        (fraction/m, rad/m)."""
        poses_gt = copy.deepcopy(poses_gt)
        poses_result = copy.deepcopy(poses_result)

        idx_0 = sorted(poses_result.keys())[0]
        pred_0 = poses_result[idx_0]
        gt_0 = poses_gt[idx_0]
        for cnt in poses_result:
            poses_result[cnt] = np.linalg.inv(pred_0) @ poses_result[cnt]
            poses_gt[cnt] = np.linalg.inv(gt_0) @ poses_gt[cnt]

        xyz_result = np.stack([poses_result[c][:3, 3] for c in poses_result], 1)
        xyz_gt = np.stack([poses_gt[c][:3, 3] for c in poses_result], 1)
        r, t, scale = umeyama_alignment(xyz_result, xyz_gt, True)
        align = np.eye(4)
        align[:3, :3] = r
        align[:3, 3] = t
        for cnt in poses_result:
            poses_result[cnt][:3, 3] *= scale
            poses_result[cnt] = align @ poses_result[cnt]

        seq_err = self.calc_sequence_errors(poses_gt, poses_result)
        if not seq_err:
            return float("nan"), float("nan")
        r_err = float(np.mean([e[1] for e in seq_err]))
        t_err = float(np.mean([e[2] for e in seq_err]))
        return t_err, r_err

    def eval(self, gt_txt: str, result_txt: str, seq: str | None = None):
        """CLI-compatible entry: score txt files, print the standard summary."""
        poses_result = self.load_poses(result_txt)
        poses_gt = self.load_poses(gt_txt)
        t_err, r_err = self.eval_poses(poses_gt, poses_result)
        print("Sequence: " + str(seq))
        print("Translational error (%): ", t_err * 100)
        print("Rotational error (deg/100m): ", r_err / np.pi * 180 * 100)
        return t_err, r_err
