"""Whole-model numerical parity vs the reference PyTorch implementation.

One random weight set (torch init) is ported into BOTH the reference's
Model_geometry (/root/reference/core/networks/model_geometry.py:768-953,
running on CPU via tests/reference_oracle.py) and this package's
``JointModel.forward_geom``; both see an identical 3-frame batch at the
training resolution (256x832 -- the reference PoseCNN's attention Linear(14,14)
is hard-wired to that resolution, pose_cnn.py:37-39). Every LIVE loss term of
the joint objective must agree, which pins down the composed graph: network
wiring, pyramid conventions, mask fusion order, loss dividers, and the
grid-sample convention (the reference's align_corners=False quirk is
reproduced via ``torch_sampling_compat``).

Depth-mode parity is subsumed: Model_depth shares the identical
compute_photometric_loss / compute_smooth_loss / texture-mask code (verified
textually identical to model_geometry.py:143-252) and its mask fusion
(valid * texture) is a sub-product of the geom fusion tested here. Flow-mode
cannot be run in the reference as published (survey defects 1-3:
AttributeError/NameError in Model_flow).
"""

import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from reference_oracle import (  # noqa: E402
    load_reference_model_geometry,
    reference_state_dict_numpy,
)
from unsupervised_depth_opticalflow_egomotion_tpu.models.joint import JointModel
from unsupervised_depth_opticalflow_egomotion_tpu.ops.warp import torch_sampling_compat
from unsupervised_depth_opticalflow_egomotion_tpu.utils.torch_port import (
    port_model_geometry,
)

B, H, W = 1, 256, 832

LIVE_LOSSES = [
    "loss_depth_pixel",
    "loss_depth_smooth",
    "loss_flow_pixel",
    "loss_flow_ssim",
    "loss_flow_smooth",
    "loss_flow_consis",
    "loss_depth_flow_consis",
    "loss_epipolar",
]
ZEROED_LOSSES = [
    "loss_depth_ssim",
    "loss_depth_consis",
    "loss_triangle",
    "loss_pnp",
    "loss_eight_point",
]


@pytest.fixture(scope="module")
def packs():
    MG = load_reference_model_geometry()
    cfg = SimpleNamespace(
        dataset="kitti_depth",
        num_scales=3,
        flow_consist_alpha=0.01,
        flow_consist_beta=0.5,
        num_input_frames=3,
        geometric_ratio=0.3,
        geometric_num=6000,
        pose_beta=1.0,
    )
    torch.manual_seed(0)
    ref = MG(cfg).eval()
    variables = port_model_geometry(reference_state_dict_numpy(ref), num_scales=3)

    rng = np.random.RandomState(0)
    imgs_np = rng.rand(B, 3, 3 * H, W).astype(np.float32)
    K = np.array([[241.0, 0, W / 2], [0, 245.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack(
        [np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(3)]
    )
    K_inv = np.stack([np.linalg.inv(k) for k in K_ms])
    K_ms_b = np.tile(K_ms[None], (B, 1, 1, 1))
    K_inv_b = np.tile(K_inv[None], (B, 1, 1, 1))

    with torch.no_grad():
        lp_t, mp_t = ref(
            (
                torch.from_numpy(imgs_np),
                torch.from_numpy(K_ms_b),
                torch.from_numpy(K_inv_b),
            )
        )

    model = JointModel(num_scales=3, remat=False)
    with torch_sampling_compat():

        @jax.jit
        def fwd(variables, imgs, K_ms, K_inv):
            return model.apply(
                variables, imgs, K_ms, K_inv, train=False,
                method=model.forward_geom, with_masks=True,
            )

        lp_j, aux_j = fwd(
            variables,
            jnp.asarray(np.transpose(imgs_np, (0, 2, 3, 1))),
            jnp.asarray(K_ms_b),
            jnp.asarray(K_inv_b),
        )
    lp_j = {k: np.asarray(v) for k, v in lp_j.items()}
    aux_j = {k: np.asarray(v) for k, v in aux_j.items()}
    lp_t = {k: float(v.float().mean()) for k, v in lp_t.items()}
    return lp_t, lp_j, mp_t, aux_j


@pytest.mark.slow
class TestGeomParity:
    def test_live_losses_match(self, packs):
        lp_t, lp_j, _, _ = packs
        for k in LIVE_LOSSES:
            t, j = lp_t[k], float(lp_j[k].mean())
            rel = abs(t - j) / (abs(t) + 1e-9)
            # observed <=1.5e-5 across all terms; 2e-4 leaves fp headroom while
            # still failing on any mask/divider/convention drift
            assert rel < 2e-4, f"{k}: torch {t} vs jax {j} (rel {rel:.2e})"

    def test_zeroed_losses_match_reference_default(self, packs):
        lp_t, lp_j, _, _ = packs
        for k in ZEROED_LOSSES:
            assert lp_t[k] == 0.0, k
            np.testing.assert_array_equal(lp_j[k], 0.0, err_msg=k)

    def test_mask_occupancy_matches(self, packs):
        """Mean occupancy of every debug mask matches: catches threshold or
        fusion-order drift that the loss means might average away."""
        _, _, mp_t, aux_j = packs
        pairs = {
            "occ_fwd_mask": "occ_fwd_mask",
            "dyna_fwd_mask": "dyna_fwd_mask",
            "valid_fwd_mask": "valid_fwd_mask",
            "fwd_mask": "fwd_mask",
            "texture_mask_fwd": "texture_mask_fwd",
            "rigid_fwd_mask": "rigid_fwd_mask",
            "inlier_fwd_mask": "inlier_fwd_mask",
        }
        for tk, jk in pairs.items():
            t = np.asarray(mp_t[tk], np.float32).mean() / 255.0
            j = float(aux_j[jk][0].mean())
            assert abs(t - j) < 1e-3, f"{tk}: torch occupancy {t} vs jax {j}"
