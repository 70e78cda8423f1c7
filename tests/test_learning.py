"""Learning-dynamics test: the flow objective optimizes and stays sane.

Builds 3-frame stacks where the scene translates by a constant +2 px/frame
in x and runs a few dozen full train steps in flow mode. At this toy size
(64x128) the PWC pyramid's coarse levels degenerate (level 6 is 1x2 px, so
the +-4 correlation window is almost all padding) and the decoder provably
cannot engage the matching pathway -- measured: training is invariant to
the second frame, for ANY occlusion scheme. Convergence-to-GT is therefore
validated at full resolution instead (flow EPE 18.6 -> 9.1 in 1.5k steps on
the exact-GT synthetic world; scripts/train_synth_long.py, TRAINING.md).
What this test pins end-to-end on CPU: the jitted train step optimizes the
flow objective (loss down), gradients stay finite, and the forward-splat
occlusion masks stay near-one on an unoccluded scene instead of collapsing.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import (
    init_state,
    make_optimizer,
    make_train_step,
)

H, W = 64, 128
SHIFT = 2


def make_shifted_batch(batch=2, seed=0):
    """Smooth random texture translating by +SHIFT px/frame in x."""
    rng = np.random.RandomState(seed)
    big = rng.rand(H, W + 2 * SHIFT + 8, 3).astype(np.float32)
    # smooth it so photometric gradients are informative
    k = np.ones((5, 5)) / 25.0
    from scipy import ndimage

    for c in range(3):
        big[..., c] = ndimage.convolve(big[..., c], k, mode="wrap")
    frames = [big[:, i * SHIFT : i * SHIFT + W] for i in range(3)]
    stack = np.concatenate(frames, axis=0)
    images = np.stack([stack] * batch)
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack(
        [np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(3)]
    )
    K_inv = np.stack([np.linalg.inv(k) for k in K_ms])
    return (
        jnp.asarray(images),
        jnp.asarray(np.tile(K_ms[None], (batch, 1, 1, 1))),
        jnp.asarray(np.tile(K_inv[None], (batch, 1, 1, 1))),
    )


@pytest.mark.slow
def test_flow_mode_learns_synthetic_shift():
    pytest.importorskip("scipy")
    cfg = Config(
        mode="flow",
        img_hw=(H, W),
        compute_dtype="float32",
        batch_size=2,
        lr=1e-3,
        # Pin the 4-tap bilinear splat this test's thresholds were calibrated
        # on: the splat_nn default (single nearest tap) is gradient-noisier at
        # this degenerate toy resolution (loss falls ~6% instead of >10%).
        # splat_nn's learning behaviour is covered at full resolution by the
        # TRAINING.md flow_splatnn/flow_nn12k A/Bs on the real chip.
        flow_occ_impl="splat",
    )
    model, state = init_state(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    step = make_train_step(model, cfg, tx)
    batch = make_shifted_batch()

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(100):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss_total"]))

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.9, f"total flow loss did not decrease: {first} -> {last}"

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    images = batch[0]
    img = images[:, H : 2 * H]
    img_r = images[:, 2 * H :]
    flow = np.asarray(
        jax.jit(lambda v, a, b: model.apply(v, a, b, method=model.inference_flow))(
            variables, img, img_r
        )
    )
    assert np.all(np.isfinite(flow))
    # flows stay in a sane range (the pre-splat-mask objective diverged to
    # NaN / hundreds of px within tens of steps)
    assert float(np.abs(flow).max()) < 4 * SHIFT + 4

    # forward-splat occlusion masks on an (almost) unoccluded scene stay
    # near one -- the degenerate schemes collapsed them to zero image-wide
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.splat import (
        occlusion_mask_from_flow,
    )

    occ = np.asarray(occlusion_mask_from_flow(jnp.asarray(-flow)))
    assert float(occ.mean()) > 0.9, f"occlusion mask collapsed: mean {occ.mean():.3f}"


def test_flow_objective_sign_convention():
    """The live flow loss pipeline has its minimum at the TRUE flow and its
    gradient at zero flow points toward it -- pins warp direction + loss
    sign end-to-end on CPU.

    The full flow-mode train test above cannot validate convergence-to-GT
    (the PWC pyramid degenerates at toy resolution), so this bypasses the
    network and probes the objective itself (photometric + ssim with
    forward-splat occlusion, the forward_flow composition) on a known-shift
    scene: (a) the loss landscape over constant flows is minimized at the
    true shift and increases on the wrong side, and (b) gradient descent on
    a raw flow field moves it in the true direction. A sign/convention
    regression in warp_flow, the loss reductions, or the occlusion masking
    flips either check.
    """
    import optax

    from unsupervised_depth_opticalflow_egomotion_tpu.ops import losses as L
    from unsupervised_depth_opticalflow_egomotion_tpu.ops import masks as M
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.splat import (
        occlusion_mask_from_flow,
    )
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.warp import warp_flow

    pytest.importorskip("scipy")
    batch = make_shifted_batch(batch=1)
    images = batch[0]
    img = images[:, H : 2 * H]
    img_r = images[:, 2 * H :]  # scene content shifted LEFT by SHIFT px
    # true forward flow (center -> right): x + flow lands on the matching
    # pixel of img_r, so flow_x = -SHIFT
    true_fx = -float(SHIFT)

    def loss_fn(flow):
        warped = warp_flow(img_r, flow, use_mask=True)
        occ = [occlusion_mask_from_flow(-flow)]
        valid = [1.0 - jnp.all(warped == 0, axis=-1, keepdims=True).astype(warped.dtype)]
        mask = M.fuse_masks(valid, occ)
        pix = L.photometric_loss([img], [warped], mask)
        ssim = L.ssim_loss([img], [warped], mask)
        return jnp.mean(0.15 * pix + 0.85 * ssim)

    def const_flow(fx):
        return jnp.zeros((1, H, W, 2), jnp.float32).at[..., 0].set(fx)

    # (a) landscape: minimum at the true shift, monotone from 0 toward it,
    # and WORSE on the wrong side of zero
    l_true = float(loss_fn(const_flow(true_fx)))
    l_half = float(loss_fn(const_flow(true_fx / 2)))
    l_zero = float(loss_fn(const_flow(0.0)))
    l_wrong = float(loss_fn(const_flow(-true_fx)))
    assert l_true < 0.2 * l_zero, f"no minimum at true flow: {l_true} vs {l_zero}"
    assert l_true < l_half < l_zero < l_wrong, (
        f"loss not descending toward true flow: {l_true}, {l_half}, {l_zero}, {l_wrong}"
    )

    # (b) descent direction: optimizing the raw flow field moves it toward
    # the true shift (per-pixel descent without a smoothness coupling stalls
    # before full convergence -- the direction is the invariant under test)
    flow = jnp.zeros((1, H, W, 2), jnp.float32)
    tx = optax.adam(0.1)
    opt = tx.init(flow)

    @jax.jit
    def do_step(f, o):
        g = jax.grad(loss_fn)(f)
        updates, o = tx.update(g, o, f)
        return optax.apply_updates(f, updates), o

    for _ in range(100):
        flow, opt = do_step(flow, opt)

    fx = np.asarray(flow)[0, 4:-4, 8:-8, 0]  # interior (borders lack evidence)
    med = float(np.median(fx))
    assert np.isfinite(med)
    assert np.sign(med) == np.sign(true_fx) and abs(med) > 0.05, (
        f"flow objective drove median flow_x to {med}, expected toward {true_fx}"
    )
