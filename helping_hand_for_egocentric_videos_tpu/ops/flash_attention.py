"""Pallas TPU fused attention for the divided space-time backbone.

Why: the backbone's divided attention runs 48 attention ops per batch
(24 blocks x space+time). The XLA lowering materialises the f32
logits/probs tensors in HBM — for ViT-L at 16 frames that is ~0.5 GB per
attention op, making the whole model HBM-bound. This kernel computes
``softmax(q k^T) v`` entirely in VMEM per group block: HBM traffic drops
to the q/k/v/o tensors themselves.

Shapes: q (G, Sq, dh), k/v (G, Sk, dh) — G independent attention groups
(G = B*heads*frames for spatial attention, B*heads*patches for temporal).
Sequence lengths here are small (Sq <= 257) so no streaming softmax is
needed: one (Sq, Sk) logits tile per group lives in VMEM (<= 264 KB).

The group dimension is blocked (``group_block``) so each grid step does a
batched (GB, Sq, dh) x (GB, Sk, dh) contraction — enough work to hide
DMA latency for the tiny temporal attention (Sk = T+1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_group_attention"]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...]  # (GB, Sq, dh)
    k = k_ref[...]
    v = v_ref[...]
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
    )  # (GB, Sq, Sk)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    out = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_block", "interpret"))
def fused_group_attention(q, k, v, *, group_block: int | None = None, interpret: bool = False):
    """softmax(q k^T) v over independent groups, logits kept in VMEM.

    Args:
        q: (G, Sq, dh) pre-scaled queries; k/v: (G, Sk, dh).
        group_block: groups per grid step (auto: targets ~2 MB VMEM/tile).
    Returns (G, Sq, dh) in q.dtype.
    """
    g, sq, dh = q.shape
    sk = k.shape[1]

    if group_block is None:
        # per-group VMEM: q+o (bf16/f32-ish 2B each), k+v, logits+exp (f32),
        # doubled for the pipeline's double buffering.
        bytes_per_group = 2 * (
            2 * sq * dh * q.dtype.itemsize
            + 2 * sk * dh * k.dtype.itemsize
            + 2 * sq * sk * 4
        )
        budget = 6 * 1024 * 1024
        group_block = max(1, min(g, budget // max(bytes_per_group, 1)))
        while g % group_block:
            group_block -= 1
    assert g % group_block == 0, (g, group_block)

    grid = (g // group_block,)
    bs = lambda s: pl.BlockSpec(
        (group_block, s, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[bs(sq), bs(sk), bs(sk)],
        out_specs=bs(sq),
        out_shape=jax.ShapeDtypeStruct((g, sq, dh), q.dtype),
        interpret=interpret,
    )(q, k, v)
