"""Integration tests for the eval task drivers on synthetic benchmark dirs."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from unsupervised_depth_opticalflow_egomotion_tpu import eval_tasks
from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
from unsupervised_depth_opticalflow_egomotion_tpu.evaluation import (
    load_gt_flow_kitti,
    write_flow_png,
)

H, W = 64, 128
NUM = 4


@pytest.fixture(scope="module")
def fake_kitti2015(tmp_path_factory):
    """A 4-pair miniature of the KITTI-2015 layout (images + GT flow pngs)."""
    root = tmp_path_factory.mktemp("k2015")
    rng = np.random.RandomState(0)
    for sub in ("image_2", "flow_occ", "flow_noc", "obj_map"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    gh, gw = 48, 96
    for i in range(NUM):
        name = str(i).zfill(6)
        img = rng.randint(0, 255, (gh, gw, 3), np.uint8)
        cv2.imwrite(os.path.join(root, "image_2", f"{name}_10.png"), img)
        cv2.imwrite(os.path.join(root, "image_2", f"{name}_11.png"), img)
        u = rng.uniform(-3, 3, (gh, gw))
        v = rng.uniform(-3, 3, (gh, gw))
        valid = np.ones((gh, gw))
        write_flow_png(os.path.join(root, "flow_occ", f"{name}_10.png"), u, v, valid)
        write_flow_png(os.path.join(root, "flow_noc", f"{name}_10.png"), u, v, valid)
        cv2.imwrite(
            os.path.join(root, "obj_map", f"{name}_10.png"),
            (rng.rand(gh, gw) > 0.8).astype(np.uint16),
        )
    return str(root)


def test_flow_eval_pipeline(fake_kitti2015, tmp_path, monkeypatch):
    # "model" that predicts zero flow -> EPE equals mean GT magnitude
    monkeypatch.setattr(
        eval_tasks, "KittiFlowEval",
        lambda d, mode, img_hw: _FakeFlowSet(d, img_hw),
    )
    cfg = Config(img_hw=(H, W), gt_2015_dir=fake_kitti2015)

    def zero_flow_fn(img1, img2):
        return jnp.zeros(img1.shape[:3] + (2,), jnp.float32)

    from unsupervised_depth_opticalflow_egomotion_tpu.evaluation.flow_metrics import (
        _read_flow_gt_worker,
    )

    pairs = [_read_flow_gt_worker(fake_kitti2015, i) for i in range(NUM)]
    gt_flows = [p[0] for p in pairs]
    noc_masks = [p[1] for p in pairs]

    sub_dir = str(tmp_path / "submission")
    m = eval_tasks.test_kitti_flow(
        cfg, zero_flow_fn, gt_flows, noc_masks, "kitti_2015", submission_dir=sub_dir
    )
    # zero prediction: EPE == mean |gt|
    expect = np.mean(
        [np.sqrt((g[:, :, 0] ** 2 + g[:, :, 1] ** 2)).mean() for g in gt_flows]
    )
    np.testing.assert_allclose(m["epe"], expect, rtol=0.05)
    assert len(os.listdir(sub_dir)) == NUM


class _FakeFlowSet:
    def __init__(self, d, img_hw):
        self.img_hw = img_hw

    def __len__(self):
        return NUM

    def __getitem__(self, i):
        h, w = self.img_hw
        img = np.zeros((2 * h, w, 3), np.float32)
        K = np.eye(3, dtype=np.float32)
        return img, K, K


@pytest.fixture(scope="module")
def fake_odom(tmp_path_factory):
    root = tmp_path_factory.mktemp("odom")
    rng = np.random.RandomState(0)
    seq_dir = os.path.join(root, "sequences", "09", "image_2")
    os.makedirs(seq_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    n = 6
    for i in range(n):
        cv2.imwrite(
            os.path.join(seq_dir, f"{i:06d}.png"),
            rng.randint(0, 255, (48, 96, 3), np.uint8),
        )
    lines = []
    for i in range(n):
        P = np.eye(4)
        P[2, 3] = i * 0.5
        lines.append(" ".join(str(v) for v in P[:3].reshape(-1)))
    with open(os.path.join(root, "poses", "09.txt"), "w") as f:
        f.write("\n".join(lines))
    return str(root)


def test_pose_eval_pipeline(fake_odom):
    cfg = Config(img_hw=(H, W), kitti_odom_dir=fake_odom, sequences=("09",))

    # "model" predicting constant forward motion matching the GT step
    def pose_fn(imgs):
        b = imgs.shape[0]
        vec = jnp.zeros((b, 2, 6), jnp.float32)
        # bwd pose (target->left): +0.5 z; fwd (target->right): -0.5 z
        vec = vec.at[:, 0, 2].set(0.5)
        vec = vec.at[:, 1, 2].set(-0.5)
        return vec

    mean_err, std_err = eval_tasks.test_pose_odom(cfg, pose_fn)
    assert mean_err[0] < 1e-5  # ATE ~ 0 for exact prediction
    assert mean_err[1] < 1e-5


def test_single_image_demo(tmp_path):
    rng = np.random.RandomState(0)
    img_path = str(tmp_path / "demo.png")
    cv2.imwrite(img_path, rng.randint(0, 255, (100, 200, 3), np.uint8))

    def disp_fn(img):
        return jnp.full(img.shape[:3] + (1,), 0.5, jnp.float32)

    depth = eval_tasks.test_single_image(img_path, disp_fn, (H, W), str(tmp_path))
    assert depth.shape == (100, 200)
    assert os.path.isfile(os.path.join(tmp_path, "demo.png"))


def test_export_trajectory(fake_odom, tmp_path):
    cfg = Config(img_hw=(H, W), kitti_odom_dir=fake_odom, sequences=("09",))

    def pose_fn(imgs):
        b = imgs.shape[0]
        vec = jnp.zeros((b, 2, 6), jnp.float32)
        vec = vec.at[:, 0, 2].set(0.5)
        vec = vec.at[:, 1, 2].set(-0.5)
        return vec

    out_txt = str(tmp_path / "09_pred.txt")
    eval_tasks.export_trajectory(cfg, pose_fn, "09", out_txt)
    poses = np.loadtxt(out_txt)
    assert poses.shape == (6, 12)  # one pose per frame (frame0->1 edge from
    # the first snippet's inverted bwd pose)
    # camera advances +0.5 z per frame (pose_fn's fwd pose is center->right
    # = -0.5, inverted to camera motion +0.5)
    z = poses[:, 11]
    np.testing.assert_allclose(np.diff(z), 0.5, atol=1e-5)


def test_two_view_flow_path(fake_kitti2015, monkeypatch):
    """predict_flows(two_view_fn=...) drives the legacy inference surface and
    threads K/K_inv through (reference test.py:33,64)."""
    monkeypatch.setattr(
        eval_tasks, "KittiFlowEval", lambda d, mode, img_hw: _FakeFlowSet(d, img_hw)
    )
    cfg = Config(img_hw=(H, W), gt_2015_dir=fake_kitti2015)
    calls = []

    def tv_fn(img1, img2, K, K_inv):
        calls.append(K.shape)
        flow = jnp.ones(img1.shape[:3] + (2,), jnp.float32)
        return flow, None, None, None

    flows = eval_tasks.predict_flows(cfg, None, "kitti_2015", two_view_fn=tv_fn)
    assert len(flows) == NUM
    assert all(f.shape == (H, W, 2) for f in flows)
    assert calls and all(s[1:] == (3, 3) for s in calls)


def test_nyu_depth_eval(tmp_path):
    """NYU labeled-mat reader + depth eval with log10 metrics (test.py:210-250)."""
    h5py = pytest.importorskip("h5py")
    sio = pytest.importorskip("scipy.io")
    from unsupervised_depth_opticalflow_egomotion_tpu.data import (
        load_nyu_test_data,
        test_nyu_depth,
    )

    rng = np.random.RandomState(0)
    n, ih, iw = 3, 480, 640
    # the labeled mat stores images [N,3,W,H] and depths [N,W,H]
    with h5py.File(os.path.join(tmp_path, "nyu_depth_v2_labeled.mat"), "w") as f:
        f["images"] = rng.randint(0, 255, (n, 3, iw, ih), np.uint8)
        f["depths"] = rng.uniform(1.0, 5.0, (n, iw, ih)).astype(np.float32)
    sio.savemat(
        os.path.join(tmp_path, "splits.mat"),
        {"testNdxs": np.array([[1], [3]], np.int64)},
    )

    imgs, depths = load_nyu_test_data(str(tmp_path))
    assert imgs.shape == (2, 3, ih, iw)
    assert depths.shape == (2, ih, iw)

    cfg = Config(img_hw=(H, W), nyu_test_dir=str(tmp_path))

    def disp_fn(img):
        return jnp.full(img.shape[:3] + (1,), 0.5, jnp.float32)

    res = test_nyu_depth(cfg, disp_fn, imgs, depths)
    assert len(res) == 7
    assert np.all(np.isfinite(res))


def test_nyu_prep_roundtrip(tmp_path):
    """NyuPrep writes the shared prepared format the training loader reads."""
    from unsupervised_depth_opticalflow_egomotion_tpu.data import (
        KittiPreparedDataset,
        NyuPrep,
    )

    rng = np.random.RandomState(0)
    raw = tmp_path / "raw"
    for scene in ("scene_a", "scene_b"):
        os.makedirs(raw / scene)
        for i in range(6):
            cv2.imwrite(str(raw / scene / f"{i:04d}.png"),
                        rng.randint(0, 255, (48, 96, 3), np.uint8))
    out = str(tmp_path / "prepared")
    index = NyuPrep(str(raw)).prepare(out, stride=2, num_workers=2)
    assert os.path.isfile(index)
    ds = KittiPreparedDataset(out, num_scales=2, img_hw=(32, 64))
    assert ds.count() == 4  # 2 scenes x (6 - 2*2) starts
    img, K_ms, _ = ds[0]
    assert img.shape == (96, 64, 3)
    # NYU intrinsics rescaled from 640x480 to 64x32
    np.testing.assert_allclose(K_ms[0][0, 0], 518.8579 * 64 / 96, rtol=1e-4)


def test_dump_mask_pack(tmp_path):
    """Training-time image observability: mask/disp/flow PNG dump."""
    from unsupervised_depth_opticalflow_egomotion_tpu.visualize import dump_mask_pack

    rng = np.random.RandomState(0)
    aux = {
        "occ_fwd_mask": rng.rand(2, H, W, 1).astype(np.float32),
        "rigid_fwd_mask": rng.rand(2, H, W, 1).astype(np.float32),
        "inlier_fwd_mask": rng.rand(2, H, W, 1).astype(np.float32),
        "dyna_fwd_mask": rng.rand(2, H, W, 1).astype(np.float32),
        "valid_fwd_mask": rng.rand(2, H, W, 1).astype(np.float32),
        "fwd_mask": rng.rand(2, H, W, 1).astype(np.float32),
        "texture_mask_fwd": rng.rand(2, H, W, 1).astype(np.float32),
        "pred_disp": rng.rand(2, H, W, 1).astype(np.float32),
        "pred_flow_fwd": rng.rand(2, H, W, 2).astype(np.float32),
    }
    center = rng.rand(H, W, 3).astype(np.float32)
    out = dump_mask_pack(aux, center, str(tmp_path), step=120)
    files = sorted(os.listdir(out))
    assert len(files) == 10  # 7 masks + disp + flow + center image
    assert "pred_disp.png" in files and "center_image.png" in files


def test_debug_drawing(tmp_path):
    from unsupervised_depth_opticalflow_egomotion_tpu.visualize import (
        draw_correspondences,
        draw_epipolar_lines,
        save_debug_pair,
    )

    rng = np.random.RandomState(0)
    img1 = rng.rand(40, 60, 3)
    img2 = rng.rand(40, 60, 3)
    matches = np.stack(
        [rng.uniform(0, 59, 30), rng.uniform(0, 39, 30),
         rng.uniform(0, 59, 30), rng.uniform(0, 39, 30)], 1
    )
    canvas = draw_correspondences(img1, img2, matches, num=10)
    assert canvas.shape == (40, 120, 3)
    F = np.eye(3)
    lines_img = draw_epipolar_lines(img1, img2, F, matches[:, :2], num=5)
    assert lines_img.shape == (40, 60, 3)
    save_debug_pair(str(tmp_path), "dbg", canvas)
    import os as _os
    assert _os.path.isfile(_os.path.join(tmp_path, "dbg.png"))


def test_plot_two_rays(tmp_path):
    """3-D ray plot (visualizer.py:197-226): intersecting rays of a true
    correspondence have dot < 1 and the PNG is written."""
    from unsupervised_depth_opticalflow_egomotion_tpu.visualize import plot_two_rays

    K = np.array([[100.0, 0, 64], [0, 100, 32], [0, 0, 1]])
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([np.eye(3), np.array([[0.5], [0.0], [0.0]])])
    # world point (1, 0, 10): cam1 pixel (74, 32); cam2 sees (1.5,0,10) -> (79, 32)
    out = str(tmp_path / "rays.png")
    dot = plot_two_rays((74, 32, 79, 32), P1, P2, out_path=out)
    assert 0.9 < dot < 1.0  # near-parallel but converging rays
    assert os.path.isfile(out)
