"""Golden tests of the pure ops against torch-CPU reference semantics.

torch is used ONLY as a test oracle (the reference implementation's backend);
the library itself never imports it.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from unsupervised_depth_opticalflow_egomotion_tpu import ops  # noqa: E402

RNG = np.random.RandomState(0)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TestResize:
    def test_bilinear_matches_torch(self):
        x = RNG.rand(2, 16, 24, 3).astype(np.float32)
        got = np.asarray(ops.resize_bilinear(jnp.asarray(x), (8, 12)))
        want = F.interpolate(
            torch.from_numpy(to_nchw(x)), (8, 12), mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(got, to_nhwc(want), atol=1e-5)

    def test_bilinear_upsample_matches_torch(self):
        x = RNG.rand(1, 8, 13, 2).astype(np.float32)
        got = np.asarray(ops.upsample2x_bilinear(jnp.asarray(x)))
        want = F.interpolate(
            torch.from_numpy(to_nchw(x)), scale_factor=2.0, mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(got, to_nhwc(want), atol=1e-5)

    def test_area_matches_torch(self):
        x = RNG.rand(2, 16, 24, 3).astype(np.float32)
        got = np.asarray(ops.resize_area(jnp.asarray(x), (4, 6)))
        want = F.interpolate(torch.from_numpy(to_nchw(x)), (4, 6), mode="area").numpy()
        np.testing.assert_allclose(got, to_nhwc(want), atol=1e-5)

    @pytest.mark.parametrize(
        "src,dst",
        [
            ((16, 24), (32, 48)),   # x2 up (closed form)
            ((8, 12), (32, 48)),    # x4 up (one-shot phases, NOT two chained x2)
            ((16, 24), (8, 12)),    # 1/2 down
            ((32, 48), (8, 12)),    # 1/4 down
            ((16, 24), (32, 12)),   # mixed up/down per axis
            ((16, 24), (24, 36)),   # non-pow2: jax.image.resize fallback
        ],
    )
    def test_bilinear_pow2_paths_match_torch(self, src, dst):
        """The closed-form pow-2 fast paths must be exact vs the oracle."""
        x = RNG.rand(2, src[0], src[1], 3).astype(np.float32)
        got = np.asarray(ops.resize_bilinear(jnp.asarray(x), dst))
        want = F.interpolate(
            torch.from_numpy(to_nchw(x)), dst, mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(got, to_nhwc(want), atol=1e-5)


class TestGridSample:
    def test_matches_torch_align_corners_true(self):
        img = RNG.rand(2, 10, 14, 3).astype(np.float32)
        coords = (RNG.rand(2, 10, 14, 2).astype(np.float32) * 2.6 - 1.3)
        got = np.asarray(ops.grid_sample(jnp.asarray(img), jnp.asarray(coords)))
        want = F.grid_sample(
            torch.from_numpy(to_nchw(img)),
            torch.from_numpy(coords),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        ).numpy()
        np.testing.assert_allclose(got, to_nhwc(want), atol=1e-5)

    def test_warp_flow_matches_reference_semantics(self):
        # Integer-shift flow on a ramp image: warped(x) = img(x + 3).
        img = np.tile(np.arange(10, dtype=np.float32)[None, None, :, None], (1, 10, 1, 1))
        flow = np.zeros((1, 10, 10, 2), np.float32)
        flow[..., 0] = 3.0
        got = np.asarray(ops.warp_flow(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(got[0, :, :6, 0], img[0, :, 3:9, 0], atol=1e-5)
        # Out of range samples -> 0 under zeros padding.
        assert np.all(got[0, :, 8:, 0] == 0)

    def test_warp_flow_mask(self):
        img = RNG.rand(1, 8, 8, 3).astype(np.float32)
        flow = np.zeros((1, 8, 8, 2), np.float32)
        flow[..., 0] = 20.0  # everything out of range
        got = np.asarray(ops.warp_flow(jnp.asarray(img), jnp.asarray(flow), use_mask=True))
        assert np.all(got == 0)


class TestSSIM:
    def test_matches_torch_reference(self):
        x = RNG.rand(2, 12, 16, 3).astype(np.float32)
        y = RNG.rand(2, 12, 16, 3).astype(np.float32)
        got = np.asarray(ops.ssim(jnp.asarray(x), jnp.asarray(y)))

        tx, ty = torch.from_numpy(to_nchw(x)), torch.from_numpy(to_nchw(y))
        pool = torch.nn.AvgPool2d(3, 1, padding=1)
        mu_x, mu_y = pool(tx), pool(ty)
        sigma_x = pool(tx**2) - mu_x**2
        sigma_y = pool(ty**2) - mu_y**2
        sigma_xy = pool(tx * ty) - mu_x * mu_y
        C1, C2 = 0.01**2, 0.03**2
        want = ((2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)) / (
            (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
        )
        np.testing.assert_allclose(got, to_nhwc(want.numpy()), atol=1e-4)


class TestCorrelation:
    def test_matches_naive_torch(self):
        f1 = RNG.rand(2, 6, 9, 8).astype(np.float32)
        f2 = RNG.rand(2, 6, 9, 8).astype(np.float32)
        d = 2
        got = np.asarray(ops.correlation(jnp.asarray(f1), jnp.asarray(f2), md=d))

        t1, t2 = torch.from_numpy(to_nchw(f1)), torch.from_numpy(to_nchw(f2))
        t2p = F.pad(t2, (d, d, d, d), value=0)
        H, W = t1.shape[2], t1.shape[3]
        cv = []
        for i in range(2 * d + 1):
            for j in range(2 * d + 1):
                cv.append((t1 * t2p[:, :, i : i + H, j : j + W]).mean(1, keepdim=True))
        want = torch.cat(cv, 1).numpy()
        np.testing.assert_allclose(got, to_nhwc(want), atol=1e-5)


class TestGeometry:
    def test_euler2mat_identity_and_known(self):
        angles = np.zeros((1, 3), np.float32)
        R = np.asarray(ops.euler2mat(jnp.asarray(angles)))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

        # 90 deg about z
        angles = np.array([[0, 0, np.pi / 2]], np.float32)
        R = np.asarray(ops.euler2mat(jnp.asarray(angles)))
        want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(R[0], want, atol=1e-6)

    def test_rotation_composition_order(self):
        # R = Rx @ Ry @ Rz (inverse_warp.py:144)
        a = RNG.rand(4, 3).astype(np.float32) * 0.5
        R = np.asarray(ops.euler2mat(jnp.asarray(a)))

        def rx(t):
            c, s = np.cos(t), np.sin(t)
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

        def ry(t):
            c, s = np.cos(t), np.sin(t)
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

        def rz(t):
            c, s = np.cos(t), np.sin(t)
            return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

        for i in range(4):
            want = rx(a[i, 0]) @ ry(a[i, 1]) @ rz(a[i, 2])
            np.testing.assert_allclose(R[i], want, atol=1e-5)

    def test_inverse_warp2_identity_pose(self):
        # With identity pose and matching depths, the warp is the identity and
        # every pixel is valid; computed depth equals the input depth.
        b, h, w = 1, 16, 20
        img = RNG.rand(b, h, w, 3).astype(np.float32)
        depth = np.full((b, h, w, 1), 2.0, np.float32)
        pose = np.zeros((b, 6), np.float32)
        K = np.array([[[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]]], np.float32)
        proj_img, valid, proj_depth, comp_depth = ops.inverse_warp2(
            jnp.asarray(img), jnp.asarray(depth), jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K)
        )
        np.testing.assert_allclose(np.asarray(proj_img), img, atol=1e-4)
        np.testing.assert_allclose(np.asarray(valid), 1.0)
        np.testing.assert_allclose(np.asarray(comp_depth), 2.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(proj_depth), 2.0, atol=1e-4)

    def test_rigid_flow_pure_translation(self):
        # Pure x-translation: flow_x = -fx * tx / Z... with pose t=[tx,0,0]
        # projected x = fx*(X + tx)/Z + cx => flow = fx*tx/Z.
        b, h, w = 1, 8, 8
        depth = np.full((b, h, w, 1), 4.0, np.float32)
        pose = np.zeros((b, 6), np.float32)
        pose[0, 0] = 0.4  # tx
        fx = 10.0
        K = np.array([[[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]]], np.float32)
        flow = np.asarray(ops.calculate_rigid_flow(jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K)))
        np.testing.assert_allclose(flow[..., 0], fx * 0.4 / 4.0, atol=1e-5)
        np.testing.assert_allclose(flow[..., 1], 0.0, atol=1e-5)

    def test_essential_matrix_epipolar_constraint(self):
        # x2^T E x1 = 0 for corresponding normalized points.
        pose = np.array([[0.1, -0.2, 0.05, 0.01, 0.02, -0.03]], np.float32)
        E = np.asarray(ops.essential_matrix(jnp.asarray(pose)))[0]
        R = np.asarray(ops.euler2mat(jnp.asarray(pose[:, 3:])))[0]
        t = pose[0, :3]
        # Random 3D point in target frame; project in both cameras.
        X1 = np.array([0.3, -0.2, 2.0])
        X2 = R @ X1 + t
        x1 = X1 / X1[2]
        x2 = X2 / X2[2]
        assert abs(x2 @ E @ x1) < 1e-5

    def test_disp2depth_bounds(self):
        disp = jnp.asarray(np.array([[[[0.0]]], [[[1.0]]]], np.float32))
        depth = np.asarray(ops.disp2depth(disp))
        np.testing.assert_allclose(depth.max(), 100.0, atol=1e-4)
        np.testing.assert_allclose(depth.min(), 0.1, atol=1e-4)


class TestReconDynamicFusion:
    """multiscale_recon_dynamic == multiscale_reconstruction + dynamic_masks.

    The fused form computes ONE pixel2cam+projection per scale and derives
    both the warp products and the rigid-flow dynamic masks; this pins that
    it is a pure refactor of the two separate calls (which the parity test
    ties to the reference)."""

    def test_matches_separate_calls(self):
        import numpy as np
        import jax.numpy as jnp

        from unsupervised_depth_opticalflow_egomotion_tpu.ops import masks as M
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.inverse_warp_multi import (
            multiscale_recon_dynamic,
            multiscale_reconstruction,
        )

        rng = np.random.RandomState(0)
        b, h, w = 2, 32, 64
        ref_img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        K = np.array([[50.0, 0, w / 2], [0, 52.0, h / 2], [0, 0, 1]], np.float32)
        K = jnp.asarray(np.tile(K[None], (b, 1, 1)))
        pose = jnp.asarray(rng.randn(b, 6).astype(np.float32) * 0.05)
        depths, depths_ref, flows = [], [], []
        for s in range(3):
            hs, ws = h // 2**s, w // 2**s
            depths.append(jnp.asarray(rng.rand(b, hs, ws, 1).astype(np.float32) * 0.3 + 0.05))
            depths_ref.append(jnp.asarray(rng.rand(b, hs, ws, 1).astype(np.float32) * 0.3 + 0.05))
            flows.append(jnp.asarray(rng.randn(b, hs, ws, 2).astype(np.float32) * 2))

        for sample_ref in (False, True):
            recs, valids, pdep, cdep = multiscale_reconstruction(
                ref_img, K, depths, depths_ref, pose, sample_ref_depth=sample_ref
            )
            fd, dyn, fds = M.dynamic_masks(K, depths, pose, flows, 0.01, 0.5)
            out = multiscale_recon_dynamic(
                ref_img, K, depths, depths_ref, pose, flows, 0.01, 0.5,
                sample_ref_depth=sample_ref,
            )
            for s in range(3):
                np.testing.assert_allclose(np.asarray(out[0][s]), np.asarray(recs[s]), atol=1e-6)
                np.testing.assert_allclose(np.asarray(out[1][s]), np.asarray(valids[s]), atol=1e-6)
                if sample_ref:
                    np.testing.assert_allclose(np.asarray(out[2][s]), np.asarray(pdep[s]), atol=1e-6)
                np.testing.assert_allclose(np.asarray(out[3][s]), np.asarray(cdep[s]), atol=1e-6)
                np.testing.assert_allclose(np.asarray(out[4][s]), np.asarray(fd[s]), atol=1e-5)
                np.testing.assert_allclose(np.asarray(out[5][s]), np.asarray(dyn[s]), atol=0)
                np.testing.assert_allclose(np.asarray(out[6][s]), np.asarray(fds[s]), rtol=1e-4)


def test_ssim_bf16_smooth_region_grad_finite():
    """bf16 SSIM on smooth regions: the f32-stats fix (ops/ssim.py).

    With bf16 statistics, E[x^2]-E[x]^2 cancels catastrophically on
    low-variance patches and (sigma_x+sigma_y+c2) crosses zero: the SSIM
    gradient NaNs on the first real full-resolution batch and one optimizer
    step poisons training. Regression: near-constant bf16 inputs must give
    finite values AND gradients."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unsupervised_depth_opticalflow_egomotion_tpu.ops.ssim import ssim

    rng = np.random.RandomState(0)
    base = 0.43 + 0.002 * rng.rand(2, 64, 96, 3).astype(np.float32)
    x = jnp.asarray(base, jnp.bfloat16)
    y = jnp.asarray(base + 0.001 * rng.rand(*base.shape).astype(np.float32), jnp.bfloat16)

    def loss(y):
        return jnp.mean((1.0 - ssim(x, y).astype(jnp.float32)) / 2.0)

    v, g = jax.value_and_grad(loss)(y)
    assert np.isfinite(float(v))
    assert bool(jnp.all(jnp.isfinite(g))), "SSIM grad not finite on smooth bf16 input"
    # the bf16-stat form also violates |SSIM| <= 1 (negative denominators:
    # observed max 1.48 on this input); the f32-stat form must stay bounded
    s = np.abs(np.asarray(ssim(x, y).astype(jnp.float32)))
    assert s.max() <= 1.0 + 1e-2, f"SSIM out of range: {s.max()}"


def test_flow_normalization_zero_flow_grad_finite():
    """bf16 zero-flow pixels must not NaN the consistency gradient
    (ops/masks.py:flow_normalization computes sqrt(s + eps) so the gradient
    is finite at zero; a 12k-step flow run died at step 5800 without it)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unsupervised_depth_opticalflow_egomotion_tpu.ops.masks import (
        flow_normalization,
    )

    rng = np.random.RandomState(0)
    f = rng.randn(2, 8, 16, 2).astype(np.float32)
    f[0, 2, 3] = 0.0  # exactly-zero flow pixel
    f[1, 5, 7] = 1e-20  # denormal-underflow territory
    x = jnp.asarray(f, jnp.bfloat16)

    def loss(x):
        return jnp.sum(jnp.abs(flow_normalization(x)).astype(jnp.float32))

    v, g = jax.value_and_grad(loss)(x)
    assert np.isfinite(float(v))
    assert bool(jnp.all(jnp.isfinite(g))), "flow_normalization grad not finite"


def test_disp_smooth_folded_matches_naive():
    """The folded coarse-grid disp-smooth evaluation equals the direct
    upsample-then-difference form (values AND disp gradients), for the
    factor-2 and factor-4 scales the training graph uses."""
    import jax

    from unsupervised_depth_opticalflow_egomotion_tpu.ops import losses as L

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 32, 48, 3).astype(np.float32))
    disps = [
        jnp.asarray(rng.rand(2, 32 // n, 48 // n, 1).astype(np.float32))
        for n in (1, 2, 4)
    ]

    def folded(*ds):
        return jnp.sum(L.disp_smooth_loss(img, list(ds)))

    def naive(*ds):
        return jnp.sum(L._disp_smooth_naive(img, list(ds)))

    vf, gf = jax.value_and_grad(folded, argnums=(0, 1, 2))(*disps)
    vn, gn = jax.value_and_grad(naive, argnums=(0, 1, 2))(*disps)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vn), rtol=2e-6)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        )


def test_disp_smooth_normalized_scale_invariant():
    """normalize=True makes the smoothness term invariant to a global
    disparity rescale (the scale-drift lever, TRAINING.md r5); with
    normalize=False the term scales linearly with disparity."""
    import jax

    from unsupervised_depth_opticalflow_egomotion_tpu.ops import losses as L

    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(2, 32, 48, 3).astype(np.float32))
    disps = [
        jnp.asarray(0.1 + rng.rand(2, 32 // n, 48 // n, 1).astype(np.float32))
        for n in (1, 2, 4)
    ]
    scaled = [d * 7.5 for d in disps]

    base_n = L.disp_smooth_loss(img, disps, normalize=True)
    scl_n = L.disp_smooth_loss(img, scaled, normalize=True)
    np.testing.assert_allclose(
        np.asarray(base_n), np.asarray(scl_n), rtol=1e-5
    )

    base = L.disp_smooth_loss(img, disps, normalize=False)
    scl = L.disp_smooth_loss(img, scaled, normalize=False)
    np.testing.assert_allclose(
        np.asarray(scl), 7.5 * np.asarray(base), rtol=1e-5
    )

    # gradients flow through the normalization (it is NOT stop-gradiented,
    # matching monodepth2)
    g = jax.grad(lambda d: jnp.sum(L.disp_smooth_loss(img, [d], True)))(
        disps[0]
    )
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.max(jnp.abs(g))) > 0
