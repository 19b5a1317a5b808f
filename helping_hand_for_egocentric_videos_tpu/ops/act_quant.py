"""Fused activation->int8 Pallas kernels for the int8 eval path.

In int8 mode every quantized matmul's input costs XLA a reduce_max pass
plus a round/clip/convert pass over a large bf16 activation (measured
~23 ms/iter at B=8 T=16 before any fusion; BENCH_NOTES). These kernels
compute the producing op AND the per-token symmetric-int8 quantization in
one VMEM round trip, so the intermediate bf16 tensor never returns to
HBM:

- ``layer_norm_int8``: LayerNorm (f32 stats, matching ``layers.layer_norm``)
  -> int8 codes + per-row scales. Feeds the qkv / mlp_fc1 matmuls (the
  block norms norm1/norm3/norm2).
- ``quick_gelu_int8``: QuickGELU -> int8 + scales. Feeds mlp_fc2 (the
  widest activation, 4D lanes).

Scale rule matches ``quant.int8_linear`` exactly: s = max(|y|)/127
floored at 1e-8, per row. Consumers use ``quant.int8_linear_prequant``.

Both kernels tile rows only (the feature axis stays whole in lanes), so
any (..., D) activation with D a lane multiple works; row counts are
padded to the tile internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["layer_norm_int8", "quick_gelu_int8"]

_ROWS = 256  # rows per program: (256, D) f32 compute tile fits VMEM to D=4096


def _quantize_rows(y):
    """(R, D) f32 -> int8 codes + (R, 1) f32 scales (int8_linear's rule)."""
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(y * (1.0 / s)), -127, 127).astype(jnp.int8)
    return q, s


def _ln_q_kernel(x_ref, g_ref, b_ref, q_ref, s_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (R, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    q, s = _quantize_rows(y)
    q_ref[...] = q
    s_ref[...] = s


def _gelu_q_kernel(x_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)
    y = x * jax.nn.sigmoid(1.702 * x)  # QuickGELU (openai_model.py:177-179)
    q, s = _quantize_rows(y)
    q_ref[...] = q
    s_ref[...] = s


def _rows_call(kernel, x, extra_inputs=(), extra_specs=(), *, interpret):
    """Run a (R, D)-tile row kernel over a flattened (..., D) activation."""
    shape = x.shape
    d = shape[-1]
    m = 1
    for s_ in shape[:-1]:
        m *= s_
    xf = x.reshape(m, d)
    rows = min(_ROWS, m)
    pad = (-m) % rows
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, d), xf.dtype)], axis=0)
    mt = xf.shape[0]

    q, s = pl.pallas_call(
        kernel,
        grid=(mt // rows,),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mt, d), jnp.int8),
            jax.ShapeDtypeStruct((mt, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xf, *extra_inputs)
    return (
        q[:m].reshape(*shape[:-1], d),
        s[:m].reshape(*shape[:-1], 1),
    )


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def layer_norm_int8(p, x, eps: float = 1e-6, *, interpret: bool = False):
    """LayerNorm + per-token int8 quantization in one kernel.

    p: {'g', 'b'} LN params (D,); x: (..., D).
    Returns (codes int8 (..., D), scales f32 (..., 1)).
    """
    d = x.shape[-1]
    g = jnp.asarray(p["g"], jnp.float32).reshape(1, d)
    b = jnp.asarray(p["b"], jnp.float32).reshape(1, d)
    spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return _rows_call(
        functools.partial(_ln_q_kernel, eps=eps),
        x,
        extra_inputs=(g, b),
        extra_specs=(spec, spec),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def quick_gelu_int8(x, *, interpret: bool = False):
    """QuickGELU + per-token int8 quantization in one kernel."""
    return _rows_call(_gelu_q_kernel, x, interpret=interpret)
