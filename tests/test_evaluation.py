"""Golden tests for the metric harnesses (depth protocol, flow EPE, odometry)."""

import os

import numpy as np
import pytest

from unsupervised_depth_opticalflow_egomotion_tpu.evaluation import (
    compute_errors,
    compute_snippet_pose_error,
    disp_to_flowfile,
    eval_depth,
    eval_flow_avg,
    flow_to_image,
    read_disp_png,
    read_flo,
    read_flow_png,
    umeyama_alignment,
    write_disp_png,
    write_flo,
    write_flow_png,
)
from unsupervised_depth_opticalflow_egomotion_tpu.evaluation.odom_eval import KittiEvalOdom


class TestDepthMetrics:
    def test_perfect_prediction(self):
        gt = np.random.RandomState(0).uniform(1, 60, (100, 200)).astype(np.float64)
        res = eval_depth([gt], [gt.copy()])
        abs_rel, sq_rel, rms, log_rms, a1, a2, a3 = res
        assert abs_rel < 1e-9 and rms < 1e-9
        assert a1 == a2 == a3 == 1.0

    def test_median_scaling_invariance(self):
        gt = np.random.RandomState(0).uniform(1, 60, (100, 200)).astype(np.float64)
        res_scaled = eval_depth([gt], [gt * 7.3])
        assert res_scaled[0] < 1e-9  # scale factored out by median scaling

    def test_garg_crop_applied(self):
        # Error outside the crop must not affect metrics.
        gt = np.full((100, 200), 10.0)
        pred = gt.copy()
        pred[:40, :] = 70.0  # above crop top (0.408*100=40.8)
        res = eval_depth([gt], [pred])
        assert res[0] < 1e-9

    def test_compute_errors_known_values(self):
        gt = np.array([2.0, 4.0])
        pred = np.array([1.0, 4.0])
        abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = compute_errors(gt, pred)
        np.testing.assert_allclose(abs_rel, (0.5 + 0) / 2)
        np.testing.assert_allclose(sq_rel, (0.5 + 0) / 2)
        np.testing.assert_allclose(a1, 0.5)  # thresh=2 > 1.25 for first


class TestFlowMetrics:
    def test_epe_zero_for_exact(self):
        H, W = 64, 96
        gt = np.zeros((H, W, 3))
        gt[:, :, 0] = 3.0
        gt[:, :, 1] = -1.0
        gt[:, :, 2] = 1.0
        noc = np.ones((H, W))
        # pred at train res (same here) matches after rescale
        pred = gt[:, :, :2].astype(np.float32).copy()
        m = eval_flow_avg([gt], [noc], [pred], (H, W))
        assert m["epe"] < 1e-5 and m["fl"] == 0.0

    def test_epe_known_offset(self):
        H, W = 32, 32
        gt = np.zeros((H, W, 3))
        gt[:, :, 2] = 1.0
        noc = np.ones((H, W))
        pred = np.zeros((H, W, 2), np.float32)
        pred[:, :, 0] = 5.0  # EPE 5 everywhere, >3px but gt norm 0 -> rate counts
        m = eval_flow_avg([gt], [noc], [pred], (H, W))
        np.testing.assert_allclose(m["epe"], 5.0, atol=1e-5)

    def test_flow_png_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        u = rng.uniform(-30, 30, (40, 50)).astype(np.float64)
        v = rng.uniform(-30, 30, (40, 50)).astype(np.float64)
        path = os.path.join(tmp_path, "flow.png")
        write_flow_png(path, u, v)
        flow = read_flow_png(path)
        np.testing.assert_allclose(flow[:, :, 0], u, atol=1 / 64 + 1e-9)
        np.testing.assert_allclose(flow[:, :, 1], v, atol=1 / 64 + 1e-9)

    def test_flow_to_image_shape(self):
        flow = np.random.RandomState(0).randn(20, 30, 2)
        img = flow_to_image(flow)
        assert img.shape == (20, 30, 3) and img.dtype == np.uint8

    def test_flo_roundtrip(self, tmp_path):
        flow = np.random.RandomState(1).randn(17, 23, 2).astype(np.float32) * 20
        path = os.path.join(tmp_path, "t.flo")
        write_flo(flow, path)
        back = read_flo(path)
        np.testing.assert_array_equal(back, flow)

    def test_flo_bad_magic_rejected(self, tmp_path):
        path = os.path.join(tmp_path, "bad.flo")
        with open(path, "wb") as f:
            np.asarray([1.0], np.float32).tofile(f)
        with pytest.raises(ValueError):
            read_flo(path)

    def test_disp_png_roundtrip(self, tmp_path):
        disp = np.random.RandomState(2).uniform(0, 200, (12, 18))
        path = os.path.join(tmp_path, "d.png")
        write_disp_png(disp, path)
        back = read_disp_png(path)
        np.testing.assert_allclose(back, disp, atol=1 / 256 + 1e-9)

    def test_disp_to_flowfile(self, tmp_path):
        disp = np.random.RandomState(3).uniform(0, 50, (9, 11)).astype(np.float32)
        path = os.path.join(tmp_path, "d.flo")
        disp_to_flowfile(disp, path)
        back = read_flo(path)
        np.testing.assert_array_equal(back[:, :, 0], disp)
        assert np.all(back[:, :, 1] == 0)


class TestOdomEval:
    def test_umeyama_recovers_similarity(self):
        rng = np.random.RandomState(0)
        x = rng.randn(3, 50)
        ang = 0.4
        R_true = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
        )
        t_true = np.array([1.0, -2.0, 0.5])
        c_true = 2.5
        y = c_true * (R_true @ x) + t_true[:, None]
        r, t, c = umeyama_alignment(x, y, with_scale=True)
        np.testing.assert_allclose(r, R_true, atol=1e-8)
        np.testing.assert_allclose(t, t_true, atol=1e-8)
        np.testing.assert_allclose(c, c_true, atol=1e-8)

    def test_snippet_pose_error_zero_for_exact(self):
        poses = np.tile(np.eye(3, 4)[None], (3, 1, 1))
        poses[:, 0, 3] = [0, 1, 2]
        ate, re = compute_snippet_pose_error(poses, poses.copy())
        assert ate < 1e-12 and re < 1e-12

    def test_full_odom_scorer(self, tmp_path):
        # Straight-line 200m trajectory, prediction identical -> zero error.
        n = 250
        lines = []
        for i in range(n):
            P = np.eye(4)
            P[2, 3] = i * 1.0  # 1 m per frame along z
            lines.append(" ".join(str(v) for v in P[:3].reshape(-1)))
        gt_txt = os.path.join(tmp_path, "gt.txt")
        res_txt = os.path.join(tmp_path, "res.txt")
        for p in (gt_txt, res_txt):
            with open(p, "w") as f:
                f.write("\n".join(lines))
        scorer = KittiEvalOdom()
        t_err, r_err = scorer.eval_poses(
            scorer.load_poses(gt_txt), scorer.load_poses(res_txt)
        )
        assert t_err < 1e-9 and r_err < 1e-9

    @staticmethod
    def _straight_line_poses(n=250, step=1.0):
        poses = {}
        for i in range(n):
            P = np.eye(4)
            P[2, 3] = i * step
            poses[i] = P
        return poses

    def test_scale_alignment_mode(self):
        # Prediction is the GT trajectory at half scale; the translation-only
        # "scale" alignment must recover it exactly.
        gt = self._straight_line_poses(step=1.0)
        pred = self._straight_line_poses(step=0.5)
        scorer = KittiEvalOdom()
        t_err, r_err = scorer.eval_poses(gt, pred, alignment="scale")
        assert t_err < 1e-9 and r_err < 1e-9

    def test_6dof_alignment_keeps_scale_error(self):
        # 6dof (no scale) must NOT absorb a 2x scale error.
        gt = self._straight_line_poses(step=1.0)
        pred = self._straight_line_poses(step=0.5)
        scorer = KittiEvalOdom()
        t_err, _ = scorer.eval_poses(gt, pred, alignment="6dof")
        assert t_err > 0.1

    def test_plots_written(self, tmp_path):
        pytest.importorskip("matplotlib")
        gt = self._straight_line_poses()
        pred = self._straight_line_poses()
        scorer = KittiEvalOdom()
        scorer.eval_poses(gt, pred, plot_dir=str(tmp_path), seq="09")
        assert os.path.exists(os.path.join(tmp_path, "sequence_09.pdf"))
        assert os.path.exists(os.path.join(tmp_path, "errors_09.pdf"))

    def test_segment_error_averaging(self):
        gt = self._straight_line_poses()
        pred = self._straight_line_poses()
        scorer = KittiEvalOdom()
        seq_err = scorer.calc_sequence_errors(gt, pred)
        avg = scorer.compute_segment_error(seq_err)
        assert avg[100] and avg[100][0] < 1e-9  # 100m segments exist, exact
        assert avg[800] == []  # 250m trajectory has no 800m segments
