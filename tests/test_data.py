"""Data pipeline tests on a synthetic mini-KITTI fixture."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unsupervised_depth_opticalflow_egomotion_tpu.config import Config, load_config, loss_weights
from unsupervised_depth_opticalflow_egomotion_tpu.data import (
    BatchLoader,
    KittiPreparedDataset,
    multiscale_intrinsics,
)


@pytest.fixture(scope="module")
def prepared_dir(tmp_path_factory):
    """A tiny prepared dataset: 6 stacked 3-frame PNGs + calib + train.txt."""
    root = tmp_path_factory.mktemp("prepared")
    rng = np.random.RandomState(0)
    h, w = 48, 96
    calib_path = os.path.join(root, "calib.txt")
    with open(calib_path, "w") as f:
        f.write("dummy: 1 2 3\n")
        f.write(
            "P_rect_02: 100.0 0.0 48.0 0.0 0.0 100.0 24.0 0.0 0.0 0.0 1.0 0.0\n"
        )
    lines = []
    os.makedirs(os.path.join(root, "drive"), exist_ok=True)
    for i in range(6):
        img = rng.randint(0, 255, (3 * h, w, 3), np.uint8)
        name = f"drive/{i:010d}.png"
        cv2.imwrite(os.path.join(root, name), img)
        lines.append(f"{name} calib.txt\n")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.writelines(lines)
    return str(root)


class TestDataset:
    def test_sample_shapes_and_range(self, prepared_dir):
        ds = KittiPreparedDataset(prepared_dir, num_scales=3, img_hw=(32, 64))
        assert ds.count() == 6 and len(ds) == 6
        img, K_ms, K_inv_ms = ds[0]
        assert img.shape == (96, 64, 3)
        assert img.dtype == np.float32
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert K_ms.shape == (3, 3, 3) and K_inv_ms.shape == (3, 3, 3)
        for s in range(3):
            np.testing.assert_allclose(
                K_ms[s] @ K_inv_ms[s], np.eye(3), atol=1e-4
            )

    def test_intrinsics_rescaled(self, prepared_dir):
        ds = KittiPreparedDataset(prepared_dir, num_scales=2, img_hw=(24, 48))
        _, K_ms, _ = ds[0]
        # original fx=100 at w=96 -> 50 at w=48; pyramid scale 1 -> 25
        np.testing.assert_allclose(K_ms[0][0, 0], 50.0, rtol=1e-5)
        np.testing.assert_allclose(K_ms[1][0, 0], 25.0, rtol=1e-5)

    def test_virtual_length_resampling_deterministic(self, prepared_dir):
        ds = KittiPreparedDataset(prepared_dir, num_scales=2, img_hw=(24, 48), num_iterations=20)
        assert len(ds) == 20
        a = ds[7][0]
        b = ds[7][0]
        np.testing.assert_array_equal(a, b)  # per-index determinism

    def test_multiscale_intrinsics_helper(self):
        K = np.array([[100.0, 0, 50], [0, 80.0, 25], [0, 0, 1]], np.float32)
        K_ms, K_inv_ms = multiscale_intrinsics(K, 3)
        np.testing.assert_allclose(K_ms[2][0, 0], 25.0)
        np.testing.assert_allclose(K_ms[2][2, 2], 1.0)


class TestBatchLoader:
    def test_batches_complete_and_shaped(self, prepared_dir):
        ds = KittiPreparedDataset(prepared_dir, num_scales=3, img_hw=(32, 64), num_iterations=10)
        loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=3)
        batches = list(loader)
        assert len(batches) == 5
        for img, K_ms, K_inv in batches:
            assert img.shape == (2, 96, 64, 3)
            assert K_ms.shape == (2, 3, 3, 3)

    def test_order_deterministic_given_seed(self, prepared_dir):
        ds = KittiPreparedDataset(prepared_dir, num_scales=2, img_hw=(24, 48), num_iterations=8)
        a = [b[0].sum() for b in BatchLoader(ds, 2, num_workers=2, seed=3)]
        b = [b[0].sum() for b in BatchLoader(ds, 2, num_workers=4, seed=3)]
        np.testing.assert_allclose(a, b)

    def test_backpressure_bounds_prefetch(self):
        """Workers must stall when the consumer does: in-flight + stored
        batches never exceed ``prefetch`` (host memory is O(prefetch))."""
        import threading
        import time

        calls = []
        lock = threading.Lock()

        class CountingDataset:
            def __len__(self):
                return 64

            def __getitem__(self, idx):
                with lock:
                    calls.append(idx)
                return (np.zeros((4,), np.float32),)

        prefetch = 3
        loader = BatchLoader(
            CountingDataset(), batch_size=1, shuffle=False,
            num_workers=4, prefetch=prefetch,
        )
        it = iter(loader)
        next(it)  # consume one batch, then stall
        time.sleep(0.5)  # give workers time to run ahead if unbounded
        with lock:
            produced = len(calls)
        # 1 consumed + at most `prefetch` outstanding (slot held per decode)
        assert produced <= 1 + prefetch, f"produced {produced} samples ahead"
        # draining still completes in order
        rest = list(it)
        assert len(rest) == 63

    def test_worker_error_propagates(self):
        class FailingDataset:
            def __len__(self):
                return 8

            def __getitem__(self, idx):
                if idx == 3:
                    raise ValueError("decode failed")
                return (np.zeros((2,), np.float32),)

        loader = BatchLoader(FailingDataset(), batch_size=1, shuffle=False, num_workers=2)
        with pytest.raises(RuntimeError, match="loader worker failed"):
            list(loader)


class TestConfig:
    def test_defaults_match_reference_weights(self):
        cfg = Config()
        w = loss_weights(cfg)
        assert w["loss_flow_pixel"] == 0.15
        assert w["loss_flow_ssim"] == 0.85
        assert w["loss_flow_smooth"] == 10.0
        assert w["loss_depth_flow_consis"] == 1.0
        assert w["loss_epipolar"] == 0.1
        assert len(w) == 13

    def test_yaml_roundtrip(self, tmp_path):
        p = os.path.join(tmp_path, "c.yaml")
        with open(p, "w") as f:
            f.write("mode: flow\nimg_hw: [128, 448]\nbatch_size: 4\nunknown_key: 7\n")
        cfg = load_config(p, lr=2e-4)
        assert cfg.mode == "flow"
        assert cfg.img_hw == (128, 448)
        assert cfg.batch_size == 4
        assert cfg.lr == 2e-4
