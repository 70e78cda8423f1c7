"""Tests for the dynamic-range int8 convolution (ops/int8_conv.py).

Pins: exactness when both operands sit on the quantization grid, the
quantization-error bound for random operands, the STE backward (exactly
the float-conv VJP at the dequantized operands), the 9-shift dot_general
lowering vs the direct conv, and the encoder integration (identical
parameter tree, trace, and gradient flow with ``encoder_int8=True``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_depth_opticalflow_egomotion_tpu.ops.int8_conv import (
    _conv_i32_9shift,
    _quant_act,
    _quant_kernel,
    int8_conv,
)

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _float_conv(x, k, strides=(1, 1), padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=_DIMNUMS
    )


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale
    )


class TestForward:
    def test_exact_on_quant_grid(self):
        """Integer operands whose absmax is exactly 127 quantize losslessly,
        so the int8 conv must equal the float conv bit-for-bit (int32
        accumulation is exact; the rescale is a power-free float mul)."""
        rng = np.random.RandomState(3)
        x = rng.randint(-127, 128, (2, 8, 16, 8)).astype(np.float32)
        x.flat[0] = 127.0
        k = rng.randint(-127, 128, (3, 3, 8, 4)).astype(np.float32)
        k[0, 0, 0, :] = 127.0  # per-channel absmax = 127 -> scale 1
        out = int8_conv(jnp.asarray(x), jnp.asarray(k))
        ref = _float_conv(jnp.asarray(x), jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    @pytest.mark.parametrize(
        "strides,padding,ksz",
        [((1, 1), ((1, 1), (1, 1)), 3), ((2, 2), ((3, 3), (3, 3)), 7),
         ((2, 2), ((0, 0), (0, 0)), 1)],
    )
    def test_quant_error_bound(self, strides, padding, ksz):
        """Random operands: the int8 forward tracks the float conv within
        the expected dynamic-range-quantization error (rel L2 ~1e-2)."""
        x = _rand((2, 16, 32, 16), seed=1)
        k = _rand((ksz, ksz, 16, 8), seed=2, scale=0.1)
        out = np.asarray(int8_conv(x, k, strides, padding), np.float32)
        ref = np.asarray(_float_conv(x, k, strides, padding), np.float32)
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel

    def test_output_dtype_follows_input(self):
        x = _rand((1, 8, 8, 4)).astype(jnp.bfloat16)
        k = _rand((3, 3, 4, 4), seed=5, scale=0.1)
        assert int8_conv(x, k).dtype == jnp.bfloat16

    def test_shift_impl_matches_conv(self):
        """The 9-shift dot_general lowering is bit-exact vs the direct int8
        conv (both accumulate the same int32 sums)."""
        rng = np.random.RandomState(7)
        xq = jnp.asarray(rng.randint(-127, 128, (2, 8, 16, 8)), jnp.int8)
        kq = jnp.asarray(rng.randint(-127, 128, (3, 3, 8, 4)), jnp.int8)
        pad = ((1, 1), (1, 1))
        ref = jax.lax.conv_general_dilated(
            xq, kq, (1, 1), pad, dimension_numbers=_DIMNUMS,
            preferred_element_type=jnp.int32,
        )
        out = _conv_i32_9shift(xq, kq, pad)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestBackward:
    def test_ste_is_float_vjp_at_dequantized_points(self):
        """d/dx sum(int8_conv) == d/dx sum(float_conv) evaluated at the
        DEQUANTIZED operands -- the defining property of the STE."""
        x = _rand((2, 8, 16, 8), seed=11)
        k = _rand((3, 3, 8, 4), seed=12, scale=0.1)
        gx, gk = jax.grad(lambda a, b: jnp.sum(int8_conv(a, b)), (0, 1))(x, k)

        xq, sx = _quant_act(x)
        kq, sk = _quant_kernel(k)
        xdq = xq.astype(jnp.float32) * sx
        kdq = kq.astype(jnp.float32) * sk
        rx, rk = jax.grad(lambda a, b: jnp.sum(_float_conv(a, b)), (0, 1))(
            xdq, kdq
        )
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)

    def test_kernel_grad_dtype_f32(self):
        x = _rand((1, 8, 8, 4)).astype(jnp.bfloat16)
        k = _rand((3, 3, 4, 4), seed=5, scale=0.1)
        gk = jax.grad(lambda b: jnp.sum(int8_conv(x, b).astype(jnp.float32)))(k)
        assert gk.dtype == jnp.float32


class TestEncoderIntegration:
    def _init(self, int8):
        from unsupervised_depth_opticalflow_egomotion_tpu.models.depth_net import (
            ResNet18Encoder,
        )

        enc = ResNet18Encoder(int8=int8, dtype=jnp.float32)
        img = _rand((1, 64, 128, 3), seed=21, scale=0.2) + 0.5
        vs = enc.init(jax.random.PRNGKey(0), img, True)
        return enc, vs, img

    def test_param_tree_identical(self):
        """int8 mode keeps the exact nn.Conv parameter tree: checkpoints
        move freely between precisions."""
        _, vs8, _ = self._init(True)
        _, vsf, _ = self._init(False)
        s8 = jax.tree_util.tree_map(lambda a: a.shape, vs8["params"])
        sf = jax.tree_util.tree_map(lambda a: a.shape, vsf["params"])
        assert s8 == sf

    def test_forward_tracks_float(self):
        enc8, vs, img = self._init(True)
        encf, _, _ = self._init(False)
        f8 = enc8.apply(vs, img, False, mutable=False)
        ff = encf.apply(vs, img, False, mutable=False)
        assert len(f8) == 5
        for a, b in zip(f8, ff):
            assert a.shape == b.shape
            ref = np.linalg.norm(np.asarray(b)) + 1e-6
            assert np.linalg.norm(np.asarray(a) - np.asarray(b)) / ref < 0.25

    def test_grads_flow_to_every_kernel(self):
        enc, vs, img = self._init(True)

        def loss(params):
            out, _ = enc.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                img, True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(jnp.abs(f.astype(jnp.float32))) for f in out)

        g = jax.grad(loss)(vs["params"])
        leaves = jax.tree_util.tree_leaves_with_path(g)
        assert leaves
        for path, leaf in leaves:
            name = jax.tree_util.keystr(path)
            if "kernel" in name:
                assert float(jnp.max(jnp.abs(leaf))) > 0.0, name

    def test_int8_packed_exclusive(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.models.depth_net import (
            ResNet18Encoder,
        )

        enc = ResNet18Encoder(int8=True, packed_layer1=True)
        with pytest.raises(ValueError, match="exclusive"):
            enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)), True)


@pytest.mark.model  # ~80 s full-step compile: model tier, not the quick gate
class TestTrainStepIntegration:
    def test_depth_mode_step_with_int8_encoder(self):
        """encoder_int8 plumbs Config -> build_model -> jitted train step:
        one depth-mode step runs, loss finite, depth params move."""
        from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
        from unsupervised_depth_opticalflow_egomotion_tpu.parallel import (
            init_state,
            make_optimizer,
            make_train_step,
        )

        h, w = 64, 128
        cfg = Config(
            img_hw=(h, w), compute_dtype="float32", batch_size=2,
            mode="depth", encoder_int8=True,
        )
        model, state = init_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(model, cfg, make_optimizer(cfg, state.params))
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(2, 3 * h, w, 3).astype(np.float32))
        K = np.array(
            [[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]], np.float32
        )
        K_ms = np.stack(
            [np.diag([0.5**s, 0.5**s, 1.0]).astype(np.float32) @ K
             for s in range(3)]
        )
        K_inv = np.stack([np.linalg.inv(k) for k in K_ms])
        batch = (
            images,
            jnp.asarray(np.tile(K_ms[None], (2, 1, 1, 1))),
            jnp.asarray(np.tile(K_inv[None], (2, 1, 1, 1))),
        )
        p0 = [
            np.asarray(x).copy()
            for x in jax.tree_util.tree_leaves(state.params["depth_net"])
        ]
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss_total"]))
        p1 = jax.tree_util.tree_leaves(state.params["depth_net"])
        assert any(
            not np.allclose(a, np.asarray(b)) for a, b in zip(p0, p1)
        )
