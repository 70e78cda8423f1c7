"""Learning-dynamics test: the flow objective must learn a synthetic shift.

Builds 3-frame stacks where the scene translates by a constant +2 px/frame in
x, runs a few dozen train steps in flow mode, and checks that (a) the
photometric loss decreases and (b) the predicted forward flow moves toward
the true displacement. This is the end-to-end gradient-correctness check the
reference lacks (SURVEY §4).
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
        mode="flow", img_hw=(H, W), compute_dtype="float32", batch_size=2, lr=1e-3
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

    # forward flow (center -> right frame) should move toward +SHIFT in x
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
    # frames are windows sliding right, so content shifts LEFT: img(x) =
    # img_r(x - SHIFT) => the correct forward flow is -SHIFT.
    center = flow[:, 8:-8, 8:-8, 0]
    assert -SHIFT - 0.7 < float(center.mean()) < -SHIFT + 0.7, (
        f"mean flow_x {center.mean():.3f}, expected ~{-SHIFT}"
    )
