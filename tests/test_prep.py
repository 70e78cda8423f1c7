"""Offline preparation tests on synthetic KITTI raw/odometry trees."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unsupervised_depth_opticalflow_egomotion_tpu.data import (
    KittiOdoPrep,
    KittiPreparedDataset,
    KittiRawPrep,
)


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    """date/drive/image_02/data frames + calib + static/test-scene lists."""
    root = tmp_path_factory.mktemp("raw")
    rng = np.random.RandomState(0)
    date = "2011_09_26"
    drives = ["2011_09_26_drive_0001_sync", "2011_09_26_drive_0002_sync"]
    for drive in drives:
        img_dir = os.path.join(root, date, drive, "image_02", "data")
        os.makedirs(img_dir)
        for i in range(6):
            cv2.imwrite(
                os.path.join(img_dir, "%.10d.png" % i),
                rng.randint(0, 255, (32, 64, 3), np.uint8),
            )
    with open(os.path.join(root, date, "calib_cam_to_cam.txt"), "w") as f:
        f.write("P_rect_02: 50.0 0.0 32.0 0.0 0.0 50.0 16.0 0.0 0.0 0.0 1.0 0.0\n")

    static_txt = os.path.join(root, "static.txt")
    with open(static_txt, "w") as f:
        # mark frame 0 of drive 0001 static
        f.write(f"{date} {drives[0]} 0\n")
    test_txt = os.path.join(root, "test_scenes.txt")
    with open(test_txt, "w") as f:
        # exclude drive 0002 (name sans _sync)
        f.write(drives[1][:-5] + "\n")
    return str(root), static_txt, test_txt, date, drives


def test_kitti_raw_prep(raw_tree, tmp_path):
    root, static_txt, test_txt, date, drives = raw_tree
    out = str(tmp_path / "prep")
    prep = KittiRawPrep(root, static_txt, test_txt)
    index = prep.prepare(out, num_workers=2)
    assert os.path.isfile(index)
    with open(index) as f:
        lines = [l.split() for l in f if l.strip()]
    # drive 0002 excluded (test scene); drive 0001 has 6 frames -> 4 triplets,
    # minus those touching static frame 0 -> 3
    assert all(drives[0] in l[0] for l in lines)
    assert len(lines) == 3
    # stacked image is 3x tall; calib copied
    img = cv2.imread(os.path.join(out, lines[0][0]))
    assert img.shape[0] == 3 * 32
    assert os.path.isfile(os.path.join(out, date, "calib_cam_to_cam.txt"))

    # the shared training dataset can consume the output directly
    ds = KittiPreparedDataset(out, num_scales=2, img_hw=(64, 128))
    sample_img, K_ms, _ = ds[0]
    assert sample_img.shape == (3 * 64, 128, 3)
    np.testing.assert_allclose(K_ms[0][0, 0], 50.0 * 128 / 64, rtol=1e-5)

    # idempotent
    assert prep.prepare(out) == index


def test_kitti_odo_prep(tmp_path):
    rng = np.random.RandomState(0)
    root = str(tmp_path / "odo")
    for seq in ("00", "01"):
        img_dir = os.path.join(root, "sequences", seq, "image_2")
        os.makedirs(img_dir)
        for i in range(5):
            cv2.imwrite(
                os.path.join(img_dir, "%.6d.png" % i),
                rng.randint(0, 255, (32, 64, 3), np.uint8),
            )
        with open(os.path.join(root, "sequences", seq, "calib.txt"), "w") as f:
            f.write("P2: 50.0 0.0 32.0 0.0 0.0 50.0 16.0 0.0 0.0 0.0 1.0 0.0\n")
    out = str(tmp_path / "odo_prep")
    index = KittiOdoPrep(root, sequences=("00", "01")).prepare(out, num_workers=2)
    with open(index) as f:
        lines = [l for l in f if l.strip()]
    assert len(lines) == 2 * 3  # 5 frames -> 3 triplets per seq
    img = cv2.imread(os.path.join(out, lines[0].split()[0]))
    assert img.shape[0] == 3 * 32  # 3-frame stacks (deliberate fix vs reference)
