"""Pallas divided space-time attention, zero HBM transposes.

The profiled bottleneck of the TimeSformer backbone on TPU is not the
attention FLOPs (tiny) but the data movement around them: head-major
transposes and grouped reshapes materialise the (B, S, D) activations in
HBM several times per block, costing ~2x the MLP time (see bench notes in
git history). These kernels consume the *packed* qkv activation exactly
as the qkv matmul produces it — (B, T, N, 3D) — and do all head
splitting, CLS concatenation, softmax and value contraction in VMEM:

- spatial mode: grid (B, T); one frame's (N, 3D) qkv tile per program;
  per head: (N, dh) x (N+1, dh) attention with the frame-broadcast CLS
  key/value prepended (reference semantics, model/LaviLa.py:254-270).
- temporal mode: grid (B, N/Nb); a (T, Nb, 3D) patch-tube tile per
  program; per head: (Nb, T, dh) x (Nb, T+1, dh) batched attention.

HBM traffic per attention: read qkv once, write the (B, T, N, D) output
once. The CLS *query* row (which attends over the full 1+T*N sequence)
is computed by the caller in plain XLA — it is one query per head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["divided_patch_attention"]


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


def _spatial_kernel(qkv_ref, clsk_ref, clsv_ref, o_ref, *, heads, dh, scale):
    tile = qkv_ref[0, 0]  # (N, 3D)
    d = heads * dh
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = tile[:, sl]
        k = tile[:, d + h * dh : d + (h + 1) * dh]
        v = tile[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        ck = clsk_ref[0, :, sl]  # (1, dh)
        cv = clsv_ref[0, :, sl]
        # scale applied to the f32 logits (== scaling q, softmax-invariant)
        logits = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT
        )  # (N, N)
        # single-column dot lowered as multiply-reduce (Mosaic rejects a
        # (N, 1) dot_general output on this toolchain)
        logit_cls = scale * jnp.sum(
            (q * ck).astype(jnp.float32), axis=-1, keepdims=True
        )  # (N, 1)
        out = _merge_cls_softmax(logits, logit_cls, v, cv, tile.dtype)
        o_ref[0, 0, :, sl] = out.astype(o_ref.dtype)


def _temporal_kernel(qkv_ref, clsk_ref, clsv_ref, o_ref, *, heads, dh, scale):
    """Per-patch attention over T frames on the natural packed-qkv tile.

    Tile (T, Nb, 3D) exactly as the qkv matmul emits it — no pre/post
    transposes in HBM (measured: two HBM transposes per layer cost more
    than this whole attention). Per head the patch tube is transposed to
    (Nb, T, dh) *in VMEM* and the T x T' contraction runs as a batched
    MXU dot; the CLS column is merged via streaming-softmax algebra
    instead of a concat (Mosaic rejects concat of lane-offset slices).
    Benchmarked faster than both a head-major pre-transposed variant and
    a transpose-free VPU multiply-reduce variant (see git history).
    """
    d = heads * dh
    t, nb = qkv_ref.shape[1], qkv_ref.shape[2]

    def one_head(q, k, v, ck, cv):
        """q/k/v (T, Nb, dh) slices; CLS ck (1, dh), cv (1, dh)."""
        q = q.transpose(1, 0, 2)  # (Nb, T, dh) — VMEM transpose
        k = k.transpose(1, 0, 2)
        v = v.transpose(1, 0, 2)
        logits = scale * jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (Nb, T, T)
        logit_cls = scale * jnp.sum(
            (q * ck[None]).astype(jnp.float32), axis=-1, keepdims=True
        )  # (Nb, T, 1)
        out = _merge_cls_softmax(logits, logit_cls, v, cv[None], q.dtype)
        return out.transpose(1, 0, 2)  # (T, Nb, dh)

    # fori over 128-lane head slabs for LARGE head counts: the loop form
    # makes Mosaic reuse per-iteration VMEM, but benches ~2.5% slower
    # in-graph than full unrolling, so <=16 heads (ViT-L) stay unrolled.
    # Dynamic lane offsets must be provable 128-multiples.
    if heads > 16 and dh <= 128 and 128 % dh == 0 and (heads * dh) % 128 == 0:
        group = 128 // dh
        slab = group * dh

        def body(s, _):
            off = pl.multiple_of(s * slab, slab)
            q_slab = qkv_ref[0, :, :, pl.ds(off, slab)]  # (T, Nb, slab)
            k_slab = qkv_ref[0, :, :, pl.ds(d + off, slab)]
            v_slab = qkv_ref[0, :, :, pl.ds(2 * d + off, slab)]
            ck_slab = clsk_ref[0, :, pl.ds(off, slab)]  # (1, slab)
            cv_slab = clsv_ref[0, :, pl.ds(off, slab)]
            outs = []
            for g in range(group):
                hs = slice(g * dh, (g + 1) * dh)
                outs.append(
                    one_head(
                        q_slab[:, :, hs], k_slab[:, :, hs], v_slab[:, :, hs],
                        ck_slab[:, hs], cv_slab[:, hs],
                    ).astype(o_ref.dtype)
                )
            full = jnp.concatenate(outs, axis=-1)  # (T, Nb, slab)
            o_ref[0, :, :, pl.ds(off, slab)] = full
            return 0

        jax.lax.fori_loop(0, heads // group, body, 0)
        return

    tile = qkv_ref[0]  # (T, Nb, 3D) — unrolled fallback for odd head dims
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        out = one_head(
            tile[:, :, sl],
            tile[:, :, d + h * dh : d + (h + 1) * dh],
            tile[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh],
            clsk_ref[0, :, sl],
            clsv_ref[0, :, sl],
        )
        o_ref[0, :, :, sl] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("mode", "heads", "patch_block", "interpret")
)
def divided_patch_attention(
    qkv,
    cls_k,
    cls_v,
    *,
    mode: str,
    heads: int,
    patch_block: int = 128,
    interpret: bool = False,
):
    """Patch-token divided attention on packed qkv.

    Args:
        qkv: (B, T, N, 3D) packed [q|k|v] activations (post qkv matmul,
            un-scaled q).
        cls_k / cls_v: (B, D) the CLS token's key/value rows.
        mode: 'space' (attend within frame) or 'time' (within patch tube).
        heads: number of attention heads (dh = D // heads).
    Returns:
        (B, T, N, D) attention output for the patch tokens.
    """
    b, t, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = dh**-0.5

    if mode == "space":
        kernel = functools.partial(_spatial_kernel, heads=heads, dh=dh, scale=scale)
        grid = (b, t)
        qkv_spec = pl.BlockSpec((1, 1, n, d3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        cls_spec = pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[qkv_spec, cls_spec, cls_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, t, n, d), qkv.dtype),
            interpret=interpret,
        )(qkv, cls_k[:, None, :], cls_v[:, None, :])

    # temporal: natural layout, same tiling scheme as spatial but blocked
    # over patches instead of frames. VMEM per program scales with t*nb,
    # so long clips shrink the patch block.
    nb = min(patch_block, 32, n)  # per-head VMEM temporaries scale with t*nb
    while n % nb:
        nb -= 1
    kernel = functools.partial(_temporal_kernel, heads=heads, dh=dh, scale=scale)
    grid = (b, n // nb)
    qkv_spec = pl.BlockSpec(
        (1, t, nb, d3), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, t, nb, d), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
    )
    cls_spec = pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, cls_spec, cls_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, n, d), qkv.dtype),
        interpret=interpret,
    )(qkv, cls_k[:, None, :], cls_v[:, None, :])
