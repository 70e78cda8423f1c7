"""Native host data service (native/kitti_data_service.cc) vs the Python loader.

Pins: decode/split/resize/flip parity with the cv2 pipeline (resize within
1 LSB), probe correctness, identical sample/flip/intrinsics stream through
NativeBatchLoader, error surfacing, and a threaded stress pass.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unsupervised_depth_opticalflow_egomotion_tpu.data import loader as pyloader
from unsupervised_depth_opticalflow_egomotion_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    native_loader.load_lib() is None,
    reason="native data service not buildable on this host",
)


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    """Tiny prepared-KITTI dir: stacked PNG + JPEG samples + calib + train.txt."""
    root = tmp_path_factory.mktemp("prep")
    rng = np.random.RandomState(0)
    h, w = 30, 50  # odd-ish dims exercise resize edge handling
    (root / "calib.txt").write_text(
        "P_rect_02: 100.0 0.0 25.0 0.0 0.0 100.0 15.0 0.0 0.0 0.0 1.0 0.0\n"
    )
    lines = []
    for i in range(6):
        img = rng.randint(0, 255, (3 * h, w, 3), np.uint8)
        name = f"{i:06d}.png" if i % 2 == 0 else f"{i:06d}.jpg"
        if name.endswith(".jpg"):
            cv2.imwrite(str(root / name), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        else:
            cv2.imwrite(str(root / name), img)
        lines.append(f"{name} calib.txt\n")
    (root / "train.txt").write_text("".join(lines))
    return str(root)


def test_probe_dims(prepared):
    for name in ["000000.png", "000001.jpg"]:
        h, w = native_loader.probe(os.path.join(prepared, name))
        assert (h, w) == (90, 50)


def test_decode_split_resize_matches_cv2(prepared):
    """decode_one == the Python pipeline's decode/split/resize within 1 LSB
    (PNG: identical decode, fixed-point-vs-cv2 resize differs by <=1)."""
    th, tw = 16, 32
    for name in ["000000.png", "000002.png"]:
        path = os.path.join(prepared, name)
        raw = cv2.imread(path)
        h_orig = raw.shape[0] // 3
        ref = np.concatenate(
            [
                cv2.resize(raw[i * h_orig : (i + 1) * h_orig], (tw, th))
                for i in range(3)
            ],
            axis=0,
        )
        got = native_loader.decode_one(path, (th, tw))
        diff = np.abs(ref.astype(int) - got.astype(int))
        assert diff.max() <= 1, f"{name}: max resize diff {diff.max()}"
        # identity resize must be exact (pure decode parity)
        ref_id = raw
        got_id = native_loader.decode_one(path, (h_orig, raw.shape[1]))
        np.testing.assert_array_equal(ref_id, got_id)


def test_jpeg_decode_close(prepared):
    """JPEG decoders (libjpeg vs cv2's) may round differently; stay close."""
    path = os.path.join(prepared, "000001.jpg")
    raw = cv2.imread(path)
    h_orig = raw.shape[0] // 3
    got = native_loader.decode_one(path, (h_orig, raw.shape[1]))
    diff = np.abs(raw.astype(int) - got.astype(int))
    assert diff.max() <= 2 and diff.mean() < 0.5


def test_flip_exactness(prepared):
    path = os.path.join(prepared, "000000.png")
    plain = native_loader.decode_one(path, (16, 32), flip=False)
    flipped = native_loader.decode_one(path, (16, 32), flip=True)
    np.testing.assert_array_equal(plain[:, ::-1], flipped)


def test_batch_loader_stream_parity(prepared):
    """NativeBatchLoader yields the same sample stream as BatchLoader: same
    file selection, flips, intrinsics; images within 1 LSB (resize impl)."""
    mk = lambda: pyloader.KittiPreparedDataset(
        prepared, num_scales=3, img_hw=(16, 32), num_iterations=8,
        seed=7, uint8_images=True,
    )
    py = list(pyloader.BatchLoader(mk(), 2, shuffle=True, num_workers=2, seed=7))
    nat = list(
        native_loader.NativeBatchLoader(mk(), 2, shuffle=True, num_workers=2, seed=7)
    )
    assert len(py) == len(nat) == 4
    for (pi, pk, pki), (ni, nk, nki) in zip(py, nat):
        assert pi.shape == ni.shape and pi.dtype == ni.dtype == np.uint8
        assert np.abs(pi.astype(int) - ni.astype(int)).max() <= 1
        np.testing.assert_allclose(pk, nk, rtol=1e-6)
        np.testing.assert_allclose(pki, nki, rtol=1e-6)


def test_error_surfacing(prepared, tmp_path):
    (tmp_path / "train.txt").write_text("missing.png calib.txt\n")
    (tmp_path / "calib.txt").write_text(
        "P: 1 0 0 0 0 1 0 0 0 0 1 0\n"
    )
    ds = pyloader.KittiPreparedDataset(
        str(tmp_path), img_hw=(16, 32), num_iterations=2, uint8_images=True
    )
    with pytest.raises(RuntimeError, match="native loader failed|open failed"):
        list(native_loader.NativeBatchLoader(ds, 2, num_workers=2))


def test_threaded_stress(prepared):
    """Many batches through a deep ring with several workers: no deadlock,
    deterministic stream (two passes identical)."""
    mk = lambda: pyloader.KittiPreparedDataset(
        prepared, num_scales=2, img_hw=(16, 32), num_iterations=64,
        seed=3, uint8_images=True, cache_decoded_bytes=1 << 20,
    )
    run = lambda: [
        b[0].sum()
        for b in native_loader.NativeBatchLoader(
            mk(), 4, shuffle=True, num_workers=3, prefetch=6, seed=3
        )
    ]
    a, b = run(), run()
    assert a == b and len(a) == 16


def test_avx2_scalar_bit_parity(prepared):
    """The AVX2 resize is the same fixed-point math as the scalar path, so
    both must produce BIT-IDENTICAL stacks (flip too). Skipped implicitly on
    non-AVX2 hosts (both calls then take the scalar path)."""
    path = os.path.join(prepared, "000000.png")
    for th, tw, flip in [(16, 32, False), (16, 32, True), (17, 31, False),
                         (90, 50, False), (7, 3, True)]:
        native_loader.set_scalar_resize(True)
        try:
            want = native_loader.decode_one(path, (th, tw), flip)
        finally:
            native_loader.set_scalar_resize(False)
        got = native_loader.decode_one(path, (th, tw), flip)
        np.testing.assert_array_equal(want, got, err_msg=f"{th}x{tw} flip={flip}")
