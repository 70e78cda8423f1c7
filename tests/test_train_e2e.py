"""End-to-end trainer test: train.py's train() on a synthetic prepared dataset.

Covers the full integration surface -- data prep index, threaded loader,
mesh, jitted step, checkpoint save, resume -- in a few tiny iterations.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unsupervised_depth_opticalflow_egomotion_tpu.config import Config


@pytest.fixture(scope="module")
def tiny_prepared(tmp_path_factory):
    root = tmp_path_factory.mktemp("prep")
    rng = np.random.RandomState(0)
    h, w = 64, 128
    with open(os.path.join(root, "calib.txt"), "w") as f:
        f.write("P_rect_02: 100.0 0.0 64.0 0.0 0.0 100.0 32.0 0.0 0.0 0.0 1.0 0.0\n")
    lines = []
    os.makedirs(os.path.join(root, "d"), exist_ok=True)
    for i in range(8):
        img = rng.randint(0, 255, (3 * h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(root, f"d/{i:06d}.png"), img)
        lines.append(f"d/{i:06d}.png calib.txt\n")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.writelines(lines)
    return str(root)


def test_train_e2e_geom_with_resume(tiny_prepared, tmp_path):
    from train import train

    model_dir = str(tmp_path / "run")
    cfg = Config(
        mode="geom",
        img_hw=(64, 128),
        batch_size=2,
        num_iterations=3,
        num_workers=2,
        log_interval=1,
        test_interval=0,
        save_interval=2,
        prepared_base_dir=tiny_prepared,
        model_dir=model_dir,
        compute_dtype="float32",
        num_devices=2,
    )
    train(cfg)
    ckpt_dir = os.path.join(model_dir, "ckpt")
    assert os.path.isdir(ckpt_dir)
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert "3" in steps or "2" in steps
    assert os.path.isfile(os.path.join(model_dir, "log.pkl"))
    assert os.path.isfile(os.path.join(model_dir, "config.json"))

    # resume from the saved checkpoint and run one more step
    cfg2 = cfg.replace(resume=True, num_iterations=4)
    train(cfg2)
    steps_after = {d for d in os.listdir(ckpt_dir) if d.isdigit()}
    assert "4" in steps_after


def test_train_e2e_flow_occ_schedule(tiny_prepared, tmp_path, capsys):
    """Occlusion schedule: the step loop switches splat_nn -> splat at the
    boundary, including when a resume lands PAST it (the >= path)."""
    from train import train

    model_dir = str(tmp_path / "run_occ")
    cfg = Config(
        mode="flow",
        img_hw=(64, 128),
        batch_size=2,
        num_iterations=3,
        num_workers=2,
        log_interval=1,
        test_interval=0,
        save_interval=2,
        prepared_base_dir=tiny_prepared,
        model_dir=model_dir,
        compute_dtype="float32",
        num_devices=2,
        flow_occ_impl="splat_nn",
        flow_occ_switch_step=2,
    )
    train(cfg)
    assert "switching to flow_occ_impl=splat" in capsys.readouterr().out
    # resume at step 3 (past the boundary): the switch must re-fire
    cfg2 = cfg.replace(resume=True, num_iterations=4)
    train(cfg2)
    assert "switching to flow_occ_impl=splat" in capsys.readouterr().out
    steps_after = {d for d in os.listdir(os.path.join(model_dir, "ckpt")) if d.isdigit()}
    assert "4" in steps_after
