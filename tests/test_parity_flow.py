"""Flow-mode numerical parity vs the reference's Model_flow internals.

The reference's flow-only mode never ran as published (survey defects 1-2:
bad cfg attribute names + an undefined ``output_flow`` name in forward), so
round-2 shipped the flow objective with only an argued -- not measured --
anchor. Here the defects are patched IN-TEST (tests/reference_oracle.py::
load_reference_model_flow), one torch-initialized weight set is ported into
both implementations, and all four flow loss terms must match under the
FAITHFUL occlusion scheme (``flow_occ_impl='diff_weights'``): soft
diff-weight masks (model_flow.py:105-138), precomputed-residual pixel loss
(:94-103), masked SSIM (:141-152), 2nd-order smooth (:161-181), and the
(1 - weight_fwd)-masked consistency (:184-199).

The live default ('splat') deviates deliberately (see JointModel.forward_flow);
with this test the deviation is a measured A/B against a pinned faithful
baseline rather than an argument.
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
    load_reference_model_flow,
    reference_state_dict_numpy,
)
from unsupervised_depth_opticalflow_egomotion_tpu.models.joint import JointModel
from unsupervised_depth_opticalflow_egomotion_tpu.ops.warp import torch_sampling_compat
from unsupervised_depth_opticalflow_egomotion_tpu.utils.torch_port import (
    port_model_flow,
)

B, H, W = 1, 128, 448  # PWC's 6-level pyramid needs H,W divisible by 64

FLOW_LOSSES = [
    "loss_flow_pixel",
    "loss_flow_ssim",
    "loss_flow_smooth",
    "loss_flow_consis",
]


@pytest.fixture(scope="module")
def packs():
    MF = load_reference_model_flow()
    cfg = SimpleNamespace(
        mode="flow",
        dataset="kitti_depth",
        num_scales=3,
        h_flow_consist_alpha=0.01,
        h_flow_consist_beta=0.5,
    )
    torch.manual_seed(0)
    ref = MF(cfg).eval()
    variables = port_model_flow(reference_state_dict_numpy(ref))

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
        lp_t = ref(
            (
                torch.from_numpy(imgs_np),
                torch.from_numpy(K_ms_b),
                torch.from_numpy(K_inv_b),
            )
        )

    model = JointModel(num_scales=3, remat=False, flow_occ_impl="diff_weights")
    with torch_sampling_compat():

        @jax.jit
        def fwd(variables, imgs, K_ms, K_inv):
            return model.apply(
                variables, imgs, K_ms, K_inv, train=False,
                method=model.forward_flow,
            )

        lp_j = fwd(
            variables,
            jnp.asarray(np.transpose(imgs_np, (0, 2, 3, 1))),
            jnp.asarray(K_ms_b),
            jnp.asarray(K_inv_b),
        )
    lp_t = {k: float(v.float().mean()) for k, v in lp_t.items()}
    lp_j = {k: float(np.asarray(v).mean()) for k, v in lp_j.items()}
    return lp_t, lp_j


@pytest.mark.slow
class TestFlowParity:
    def test_flow_losses_match(self, packs):
        lp_t, lp_j = packs
        for k in FLOW_LOSSES:
            t, j = lp_t[k], lp_j[k]
            rel = abs(t - j) / (abs(t) + 1e-9)
            assert rel < 2e-4, f"{k}: torch {t} vs jax {j} (rel {rel:.2e})"


def test_flow_occ_impl_switch_smoke():
    """Both occlusion impls compile and produce finite, distinct losses."""
    rng = np.random.RandomState(1)
    h, w = 64, 128
    imgs = jnp.asarray(rng.rand(1, 3 * h, w, 3).astype(np.float32))
    K = np.eye(3, dtype=np.float32)
    K_ms = jnp.asarray(np.tile(K[None, None], (1, 3, 1, 1)))
    packs = {}
    for impl in ("splat", "diff_weights"):
        model = JointModel(num_scales=3, remat=False, flow_occ_impl=impl)
        variables = model.init(
            jax.random.PRNGKey(0), imgs, K_ms, K_ms, method=model.forward_flow
        )
        lp = model.apply(variables, imgs, K_ms, K_ms, method=model.forward_flow)
        packs[impl] = {k: float(np.asarray(v).mean()) for k, v in lp.items()}
        for k, v in packs[impl].items():
            assert np.isfinite(v), f"{impl} {k} not finite"
    assert packs["splat"]["loss_flow_pixel"] != packs["diff_weights"]["loss_flow_pixel"]
