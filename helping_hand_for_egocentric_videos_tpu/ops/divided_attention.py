"""Pallas divided space-time attention, zero HBM transposes.

The profiled bottleneck of the TimeSformer backbone on TPU is not the
attention FLOPs (tiny) but the data movement around them: head-major
transposes and grouped reshapes materialise the (B, S, D) activations in
HBM several times per block. These kernels consume the *packed* qkv
activation exactly as the qkv matmul produces it — (B, T, N, 3D) — and do
all head splitting, CLS broadcast, softmax and value contraction in VMEM:

- spatial mode: grid (B, T); one frame's (N, 3D) qkv tile per program;
  per head: (N, dh) x (N+1, dh) attention with the frame-broadcast CLS
  key/value merged via streaming-softmax algebra (reference semantics,
  model/LaviLa.py:254-270).
- temporal mode: grid (B, N/Nb); a (T, Nb, 3D) patch-tube tile per
  program; per head an in-VMEM transpose to (Nb, T, dh) feeds a batched
  MXU dot (measured faster than head-major HBM pre-transposes and than a
  transpose-free VPU contraction — see BENCH_NOTES.md).

The CLS *query* (which attends over the full 1 + T*N sequence,
L:257-258) is also computed here: every program emits streaming-softmax
partials (running max / sum-exp / weighted values) for its tile, and the
caller merges them in XLA — so the packed qkv is read exactly once and no
(B, S, D) key/value slices ever materialise in HBM.

HBM traffic per attention: read qkv once, write the (B, T, N, D) output
once (+ tiny partial tensors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["divided_patch_attention", "merge_cls_partials"]


def _merge_cls_softmax(logits_patch, logit_cls, v, cv, dtype):
    """softmax over [cls | patch] columns without materialising a concat.

    logits_patch (..., Q, K) f32, logit_cls (..., Q, 1) f32,
    v (..., K, dh), cv (..., 1, dh) -> (..., Q, dh) f32.
    """
    m = jnp.maximum(jnp.max(logits_patch, axis=-1, keepdims=True), logit_cls)
    e_p = jnp.exp(logits_patch - m)
    e_c = jnp.exp(logit_cls - m)
    denom = jnp.sum(e_p, axis=-1, keepdims=True) + e_c
    out = jax.lax.dot_general(
        e_p.astype(dtype),
        v,
        (((e_p.ndim - 1,), (v.ndim - 2,)), (tuple(range(e_p.ndim - 2)),) * 2),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    out = out + e_c * cv.astype(jnp.float32)
    return out / denom


def _cls_partials(k_rows, v_rows, cq, scale):
    """Streaming-softmax partials of the CLS query over this tile's keys.

    k_rows/v_rows (R, dh), cq (1, dh) -> (m (1,1), s (1,1), o (1,dh) f32).
    """
    l = scale * jnp.sum((k_rows * cq).astype(jnp.float32), axis=-1, keepdims=True)
    m = jnp.max(l, axis=0, keepdims=True)  # (1, 1)
    e = jnp.exp(l - m)  # (R, 1)
    s = jnp.sum(e, axis=0, keepdims=True)  # (1, 1)
    o = jnp.sum(e * v_rows.astype(jnp.float32), axis=0, keepdims=True)  # (1, dh)
    return m, s, o


def _write_partials(m_ref, s_ref, co_ref, idx, ms, ss, cos, heads):
    pad = 128 - heads
    m_row = jnp.pad(jnp.concatenate(ms, axis=1), ((0, 0), (0, pad)))
    s_row = jnp.pad(jnp.concatenate(ss, axis=1), ((0, 0), (0, pad)))
    co_row = jnp.concatenate(cos, axis=1)  # (1, D)
    m_ref[idx] = jnp.broadcast_to(m_row, (8, 128))
    s_ref[idx] = jnp.broadcast_to(s_row, (8, 128))
    co_ref[idx] = jnp.broadcast_to(co_row, (8, co_row.shape[1]))


def _spatial_kernel(
    qkv_ref, clsk_ref, clsv_ref, clsq_ref, o_ref, m_ref, s_ref, co_ref, *, heads, dh, scale
):
    tile = qkv_ref[0, 0]  # (N, 3D)
    d = heads * dh
    ms, ss, cos = [], [], []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = tile[:, sl]
        k = tile[:, d + h * dh : d + (h + 1) * dh]
        v = tile[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        ck = clsk_ref[0, :, sl]  # (1, dh)
        cv = clsv_ref[0, :, sl]
        # scale applied to the f32 logits (== scaling q, softmax-invariant)
        logits = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (N, N)
        # single-column dot lowered as multiply-reduce (Mosaic rejects a
        # (N, 1) dot_general output on this toolchain)
        logit_cls = scale * jnp.sum(
            (q * ck).astype(jnp.float32), axis=-1, keepdims=True
        )  # (N, 1)
        out = _merge_cls_softmax(logits, logit_cls, v, cv, tile.dtype)
        o_ref[0, 0, :, sl] = out.astype(o_ref.dtype)

        m_h, s_h, o_h = _cls_partials(k, v, clsq_ref[0, :, sl], scale)
        ms.append(m_h)
        ss.append(s_h)
        cos.append(o_h)
    _write_partials(m_ref, s_ref, co_ref, (0, 0), ms, ss, cos, heads)


def _temporal_kernel(
    qkv_ref, clsk_ref, clsv_ref, clsq_ref, o_ref, m_ref, s_ref, co_ref, *, heads, dh, scale
):
    """Per-patch attention over T frames on the natural packed-qkv tile."""
    tile = qkv_ref[0]  # (T, Nb, 3D)
    d = heads * dh
    t, nb = tile.shape[0], tile.shape[1]
    ms, ss, cos = [], [], []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        k3 = tile[:, :, d + h * dh : d + (h + 1) * dh]
        v3 = tile[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        q = tile[:, :, sl].transpose(1, 0, 2)  # (Nb, T, dh) — VMEM transpose
        k = k3.transpose(1, 0, 2)
        v = v3.transpose(1, 0, 2)
        ck = clsk_ref[0, :, sl]  # (1, dh)
        cv = clsv_ref[0, :, sl][None]  # (1, 1, dh)
        logits = scale * jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (Nb, T, T)
        logit_cls = scale * jnp.sum(
            (q * ck[None]).astype(jnp.float32), axis=-1, keepdims=True
        )  # (Nb, T, 1)
        out = _merge_cls_softmax(logits, logit_cls, v, cv, tile.dtype)
        o_ref[0, :, :, sl] = out.transpose(1, 0, 2).astype(o_ref.dtype)

        m_h, s_h, o_h = _cls_partials(
            k3.reshape(t * nb, dh), v3.reshape(t * nb, dh), clsq_ref[0, :, sl], scale
        )
        ms.append(m_h)
        ss.append(s_h)
        cos.append(o_h)
    _write_partials(m_ref, s_ref, co_ref, (0, 0), ms, ss, cos, heads)


def merge_cls_partials(m, s, co, cls_q, cls_k, cls_v, heads: int):
    """Combine per-tile CLS partials with the CLS self-attention term.

    m/s (B, G, 8, 128) f32 (row 0 valid, first ``heads`` lanes), co
    (B, G, 8, D); cls_q/k/v (B, D) unscaled -> (B, D) attention output of
    the CLS query over [cls | all patch tokens].
    """
    b = m.shape[0]
    m = m[:, :, 0, :heads]  # (B, G, H)
    s = s[:, :, 0, :heads]
    d = co.shape[-1]
    dh = d // heads
    co = co[:, :, 0, :].reshape(b, -1, heads, dh)  # (B, G, H, dh)
    scale = dh**-0.5

    cqh = cls_q.reshape(b, heads, dh).astype(jnp.float32)
    ckh = cls_k.reshape(b, heads, dh).astype(jnp.float32)
    cvh = cls_v.reshape(b, heads, dh).astype(jnp.float32)
    l_self = scale * jnp.sum(cqh * ckh, axis=-1)  # (B, H)

    m_g = jnp.maximum(jnp.max(m, axis=1), l_self)  # (B, H)
    w = jnp.exp(m - m_g[:, None, :])  # (B, G, H)
    e_self = jnp.exp(l_self - m_g)  # (B, H)
    denom = jnp.sum(s * w, axis=1) + e_self
    num = jnp.sum(co * w[..., None], axis=1) + e_self[..., None] * cvh
    return (num / denom[..., None]).reshape(b, d)


@functools.partial(
    jax.jit, static_argnames=("mode", "heads", "patch_block", "interpret")
)
def divided_patch_attention(
    qkv,
    cls_k,
    cls_v,
    cls_q=None,
    *,
    mode: str,
    heads: int,
    patch_block: int = 128,
    interpret: bool = False,
):
    """Patch-token divided attention on packed qkv (+ CLS partials).

    Args:
        qkv: (B, T, N, 3D) packed [q|k|v] activations (post qkv matmul,
            un-scaled q).
        cls_k / cls_v: (B, D) the CLS token's key/value rows.
        cls_q: optional (B, D) CLS query (un-scaled); when given, the
            kernels also emit streaming-softmax partials of the CLS query
            over the patch keys, merged with ``merge_cls_partials``.
    Returns:
        (B, T, N, D) patch output, and — when cls_q is given —
        (m, s, co) partial tensors shaped (B, G, 8, 128/128/D).
    """
    b, t, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = dh**-0.5
    want_partials = cls_q is not None
    if cls_q is None:
        cls_q = jnp.zeros_like(cls_k)

    if mode == "space":
        kernel = functools.partial(_spatial_kernel, heads=heads, dh=dh, scale=scale)
        grid = (b, t)
        g = t
        qkv_spec = pl.BlockSpec((1, 1, n, d3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        part_spec = lambda w: pl.BlockSpec(  # noqa: E731
            (1, 1, 8, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        # temporal: blocked over patches; per-head VMEM temporaries scale
        # with t*nb, so the patch block stays modest (long clips shrink it).
        nb = min(patch_block, 32 if t <= 8 else 16, n)
        while n % nb:
            nb -= 1
        kernel = functools.partial(_temporal_kernel, heads=heads, dh=dh, scale=scale)
        grid = (b, n // nb)
        g = n // nb
        qkv_spec = pl.BlockSpec((1, t, nb, d3), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, t, nb, d), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
        part_spec = lambda w: pl.BlockSpec(  # noqa: E731
            (1, 1, 8, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        )

    cls_spec = pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out, m, s, co = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, cls_spec, cls_spec, cls_spec],
        out_specs=[out_spec, part_spec(128), part_spec(128), part_spec(d)],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, g, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, g, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, g, 8, d), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, cls_k[:, None, :], cls_v[:, None, :], cls_q[:, None, :])
    if want_partials:
        return out, (m, s, co)
    return out
