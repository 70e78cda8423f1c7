"""Dynamic-range int8 convolution with straight-through gradients.

The geom step's convolution pool (53.8 ms of the 142 ms step, PERF.md
round-5 decomposition) executes at ~51% of v5e bf16 peak and is the only
block whose absolute time can still halve on this chip: the v5e MXU's
int8 mode is 2x its bf16 peak (~394 TOP/s). This op runs a convolution's
forward in int8:

- activations quantize per-tensor (symmetric, dynamic absmax -> scale);
- weights quantize per-output-channel (symmetric absmax over kh/kw/Cin);
- the convolution accumulates in int32 and rescales to the compute dtype.

Gradients are straight-through (standard QAT): the backward evaluates the
ordinary convolution VJP at the DEQUANTIZED operands -- exactly the
gradient of ``conv(fake_quant(x), fake_quant(k))`` with identity-STE
fake-quant -- so training sees the forward's quantization error (and
adapts to it) while gradients stay in bf16/f32. With dynamic absmax
scaling nothing clips except the extremal element, so the identity STE
is exact almost everywhere.

Two int8 lowerings are provided (``impl``):

- ``"conv"``: ``lax.conv_general_dilated`` on int8 operands with int32
  ``preferred_element_type`` -- the direct form; whether XLA lowers it at
  int8 MXU rate is measured by scripts/bench_fp8.py's conv arms.
- ``"shift"``: stride-1 SAME 3x3 decomposed into 9 shifted 1x1 contractions
  (``dot_general`` over Cin, the int8 path known to hit MXU int8 rate),
  accumulated in int32. Falls back to ``"conv"`` for non-3x3/strided cases.

Reference counterpart: none -- the reference trains f32 end-to-end; this
is the int8 lever of the PERF.md v5p/int8 north-star projection.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# flip the int8 lowering without re-plumbing configs (bench A/B hook)
_IMPL = os.environ.get("INT8_CONV_IMPL", "conv")


def _quant_act(x):
    """Per-tensor symmetric int8: q = round(x/s), s = absmax/127."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0)
    return q.astype(jnp.int8), s


def _quant_kernel(k):
    """Per-output-channel symmetric int8 over the [kh,kw,Cin,Co] kernel."""
    kf = k.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8) / 127.0
    q = jnp.clip(jnp.round(kf / s), -127.0, 127.0)
    return q.astype(jnp.int8), s


def _conv_i32(xq, kq, strides, padding):
    if _IMPL == "shift" and kq.shape[:2] == (3, 3) and strides == (1, 1):
        return _conv_i32_9shift(xq, kq, padding)
    return jax.lax.conv_general_dilated(
        xq, kq, strides, padding,
        dimension_numbers=_DIMNUMS, preferred_element_type=jnp.int32,
    )


def _conv_i32_9shift(xq, kq, padding):
    """Stride-1 3x3 as 9 shifted [BHW,Cin]x[Cin,Co] int8 contractions."""
    b, h, w, cin = xq.shape
    (pt, pb), (pl_, pr) = padding
    xp = jnp.pad(xq, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    ho, wo = h + pt + pb - 2, w + pl_ + pr - 2
    acc = jnp.zeros((b, ho, wo, kq.shape[-1]), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (b, ho, wo, cin)
            )
            acc = acc + jax.lax.dot_general(
                tap, kq[dy, dx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    return acc


def _fwd_impl(x, k, strides, padding):
    xq, sx = _quant_act(x)
    kq, sk = _quant_kernel(k)
    y = _conv_i32(xq, kq, strides, padding)
    y = y.astype(jnp.float32) * (sx * sk)
    # the dequantized operands ARE the points the forward multiplied:
    # the STE backward differentiates the float conv there
    xdq = (xq.astype(jnp.float32) * sx).astype(x.dtype)
    kdq = (kq.astype(jnp.float32) * sk).astype(x.dtype)
    return y.astype(x.dtype), (xdq, kdq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_conv(x, k, strides=(1, 1), padding=((1, 1), (1, 1))):
    """NHWC conv with an int8 forward and straight-through backward.

    ``x`` [B,H,W,Cin] in the compute dtype (bf16/f32); ``k`` the f32
    [kh,kw,Cin,Co] parameter. ``strides``/``padding`` static (hashable).
    Output in ``x.dtype``. Drop-in for the no-bias ``nn.Conv`` form used
    by the depth encoder (models/depth_net.py).
    """
    y, _ = _fwd_impl(x, k, strides, padding)
    return y


def _int8_conv_fwd(x, k, strides, padding):
    y, res = _fwd_impl(x, k, strides, padding)
    return y, res


def _int8_conv_bwd(strides, padding, res, g):
    xdq, kdq = res

    def _float_conv(a, b):
        return jax.lax.conv_general_dilated(
            a, b, strides, padding, dimension_numbers=_DIMNUMS,
        )

    _, vjp = jax.vjp(_float_conv, xdq, kdq)
    dx, dk = vjp(g.astype(xdq.dtype))
    # kernel params live in f32 regardless of the compute dtype
    return dx, dk.astype(jnp.float32)


int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)
