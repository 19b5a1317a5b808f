"""Pallas divided space-time attention, zero HBM transposes.

The profiled bottleneck of the TimeSformer backbone on TPU is not the
attention FLOPs (tiny — all MXU dots together are a few ms/iter) but VPU
element count and data movement: head-major transposes and grouped
reshapes materialise the (B, S, D) activations in HBM several times per
block, and every elementwise pass over the f32 logits costs real wall
time. These kernels consume the *packed* qkv activation exactly as the
qkv matmul produces it — (B, T, N, 3D) — and do all head splitting, CLS
broadcast, softmax and value contraction in VMEM.

Both modes run the same "rows" kernel over a flat (R, 3D) tile:

- spatial mode: grid (B, T); one frame's tile, R = N rows; per head one
  (R, R) logits dot on the MXU, with the frame-broadcast CLS key/value
  column merged via streaming-softmax algebra (reference semantics,
  model/LaviLa.py:254-270).
- temporal mode: grid (B, N/Nb); a (T, Nb, 3D) patch-tube tile flattened
  t-major to R = T*Nb rows, with a periodic block-diagonal mask
  (row % Nb == col % Nb keeps same-patch pairs) added to the logits.
  Masked probabilities are exactly zero, so the value contraction is
  exact. This wastes Nb x the attention FLOPs but replaces per-head VMEM
  transposes + tiny (T, T) batched dots with one full-size MXU dot per
  head — measured ~1.6x faster at ViT-L eval shapes (BENCH_NOTES.md).

The CLS *query* (which attends over the full 1 + T*N sequence,
L:257-258) rides along as one extra row: the kernel appends the packed
CLS row [cq|ck|cv] to the tile, so every per-head logits dot computes the
CLS query's logits over this tile's keys as row R at +1/R cost, and the
unnormalised value contraction appears as row R of the same probs @ v
dot. Each program emits those streaming-softmax partials (running max /
sum-exp / weighted values, self-logit excluded) into per-head sublane
slots — no lane-offset concats — and the caller merges them in XLA. The
packed qkv is thus read exactly once and no (B, S, D) key/value slices
ever materialise in HBM.

HBM traffic per attention: read qkv once, write the (B, T, N, D) output
once (+ tiny partial tensors).

All dots pin an explicit precision (never the ambient default): a global
jax_default_matmul_precision override ('highest') would otherwise reach
the kernel body and make Mosaic reject the bf16 matmuls. bf16/int8
activations use DEFAULT; f32 activations (tests, dryrun, debug) pin
HIGHEST, because jax 0.9 backends compute DEFAULT-precision f32 dots at
reduced precision — which broke the fused_den invariant that the
ones-column sum equals an exact jnp.sum (see _rows_kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["divided_patch_attention", "merge_cls_partials"]

_PREC = jax.lax.Precision.DEFAULT


def _scoped_vmem_ask(r: int, heads: int) -> int:
    """Estimated Mosaic scoped-VMEM stack ask of one rows-kernel program,
    bytes. The dominant terms are the (R+1, R) f32 logits and exp buffers
    per head, and the Mosaic stack allocator does NOT reuse them across
    the unrolled head loop (MEASURED on v5e: the t=64/R=512 single-tile
    kernel asks 33.65 MiB ~= 16 heads x 2 x 513*512*4 B; a q-chunked
    rewrite that bounded the LIVE buffer to (128, R) still asked 31.03 MiB
    — per-iteration buffers accumulate either way, BENCH_NOTES r5). Long
    tiles therefore keep the proven single-tile body and raise the
    per-kernel ``vmem_limit_bytes`` instead (see divided_patch_attention);
    this estimate gates how far that stretch is safe."""
    return heads * 2 * (r + 1) * r * 4


# v5e/v5p VMEM is 128 MiB; leave headroom for the double-buffered input/
# output blocks (~10 MiB at the flagship T=64 temporal tile) and the
# compiler's own scratch. Single-tile temporal asks past this switch to
# the per-head grid variant (needs_head_grid); only shapes whose
# PER-HEAD ask also exceeds it fall back to the XLA path
# (spacetime_vit._kernel_friendly, mode='time').
_VMEM_LIMIT = 100 * 1024 * 1024


def _headgrid_vmem_ask(r: int) -> int:
    """Estimated scoped-VMEM ask of one HEAD-GRID program, bytes: one
    head's (R+1, R) f32 logits + exp buffers, the f32 periodic mask and
    its two int32 iotas, plus slack for Mosaic's own temporaries — no
    unrolled head loop, so nothing accumulates."""
    return 6 * (r + 1) * r * 4


def needs_head_grid(t: int, n: int, heads: int) -> bool:
    """True when the temporal single-tile kernel's scoped-VMEM ask
    (quadratic in R per unrolled head, ``_scoped_vmem_ask``) exceeds
    ``_VMEM_LIMIT`` — T > 64 at flagship heads — and the per-head grid
    variant must carry the tile instead."""
    r = t * _temporal_block(t, n)
    return _scoped_vmem_ask(r, heads) + 16 * 1024 * 1024 > _VMEM_LIMIT


def _rows_kernel(
    qkv_ref, cls_ref, o_ref, m_ref, s_ref, co_ref, *rest,
    heads, dh, scale, nb, t, quant_out=False, fused_den=False,
    coalesce_out=False,
):
    """One tile of divided attention on flat rows (+ CLS query row).

    nb=None -> spatial (tile (1, N, 3D)); nb=int -> temporal (tile
    (T, Nb, 3D), flattened t-major with a periodic same-patch mask).

    quant_out: additionally per-token symmetric-int8 quantize the patch
    output in-VMEM (o_ref int8 + per-row scales in sq_ref), so a
    quantized projection matmul consumes it directly — the XLA-side
    reduce_max + convert passes over the attention output disappear and
    the HBM output write halves (int8 eval mode; see models/quant.py).

    coalesce_out: epilogue A/B variant (kernel-tail experiment #2,
    BENCH_NOTES r4): instead of 16 half-register lane-sliced stores of
    (R, dh=64) per-head outputs plus 48 tiny (1, 1)/(1, dh) CLS-partial
    stores per program, accumulate everything in VREGs and emit ONE
    full-width (R, D) output store + three (H, ·) partial stores after
    the head loop. Identical math — only the store schedule changes.
    """
    if quant_out:
        if coalesce_out:
            (sq_ref,) = rest
        else:
            sq_ref, scratch_ref = rest
    d = heads * dh
    tile = qkv_ref[0]
    r = tile.shape[0] * tile.shape[1] if nb is not None else tile.shape[1]
    # one sublane concat per program: rows + the packed [cq|ck|cv] row
    rows = jnp.concatenate([tile.reshape(r, 3 * d), cls_ref[0]], axis=0)
    ra = r + 1
    # f32 activations (tests, dryrun, debug) get true-f32 dots: under
    # DEFAULT, jax 0.9's CPU (and TPU) backends compute f32 dots at
    # reduced precision, which would make e.g. the fused_den ones-column
    # sum drift ~1e-3 from an exact jnp.sum. Production runs bf16/int8,
    # where DEFAULT is required (Mosaic rejects 'highest' bf16 dots).
    prec = (
        jax.lax.Precision.HIGHEST if rows.dtype == jnp.float32 else _PREC
    )

    if nb is not None and nb > 1:
        # same-patch visibility for patch rows; the CLS-query row (r) sees
        # every patch key
        ri = jax.lax.broadcasted_iota(jnp.int32, (ra, r), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (ra, r), 1)
        neg = jnp.where(((ri % nb) == (ci % nb)) | (ri == r), 0.0, -1e30)
    else:
        neg = None
    # CLS-key logit column: valid for patch rows; -inf at the CLS-query
    # row so the emitted partials exclude the self term (merge adds it
    # exactly once globally)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (ra, 1), 0)
    self_mask = jnp.where(row_i == r, -1e30, 0.0)  # (RA, 1)

    outs = [] if coalesce_out else None
    part_m, part_s, part_co = [], [], []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = rows[:, sl]  # (RA, dh) — last row is the CLS query
        k = rows[:r, d + h * dh : d + (h + 1) * dh]  # (R, dh) patch keys
        v = rows[:r, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        ck = rows[r:, d + h * dh : d + (h + 1) * dh]  # (1, dh)
        cv = rows[r:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        # scale applied to the f32 logits (== scaling q, softmax-invariant)
        logits = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (RA, R)
        if neg is not None:
            logits = logits + neg
        lc = scale * jnp.sum(
            (q * ck).astype(jnp.float32), axis=-1, keepdims=True
        ) + self_mask  # (RA, 1)
        # softmax over [cls | visible rows] without materialising a concat
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), lc)
        e_c = jnp.exp(lc - m)
        if fused_den:
            # single elementwise pass over the logits: exp fused straight
            # into the bf16 probs the MXU consumes (no f32 e_p buffer, no
            # separate sum or cast passes). The denominator rides the
            # value dot as an appended ones column — the (R, dh=64)
            # operand is lane-padded to 128 by Mosaic anyway, so the
            # column (and its zero fill) is free MXU work. den is then a
            # sum of the SAME bf16 probs the numerator uses; per-row
            # rounding errors average out (~1e-4 relative, see
            # tests/test_tpu_kernels.py fused-vs-plain agreement).
            p = jnp.exp(logits - m).astype(rows.dtype)  # (RA, R) bf16
            pad = (-(dh + 1)) % 128  # >=128 output lanes (landmine 6)
            cols = [v, jnp.ones((r, 1), rows.dtype)]
            if pad:
                cols.append(jnp.zeros((r, pad), rows.dtype))
            vp = jnp.concatenate(cols, axis=1)  # (R, dh+1+pad): [v | 1 | 0]
            raw128 = jax.lax.dot_general(
                p, vp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (RA, 128)
            raw = raw128[:, :dh]
            den = raw128[:, dh : dh + 1] + e_c
        else:
            e_p = jnp.exp(logits - m)
            den = jnp.sum(e_p, axis=-1, keepdims=True) + e_c
            raw = jax.lax.dot_general(
                e_p.astype(rows.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (RA, dh)
        out = (raw[:r] + e_c[:r] * cv.astype(jnp.float32)) / den[:r]
        if coalesce_out:
            outs.append(out)
            # CLS streaming partials = row r (e_c[r] is exp(-1e30 - m)
            # == 0, so den[r]/raw[r] cover the patch keys only)
            part_m.append(m[r:])
            part_s.append(den[r:])
            part_co.append(raw[r:])
            continue
        if quant_out:
            scratch_ref[:, sl] = out  # f32; quantized once after the loop
        elif nb is None:
            o_ref[0, 0, :, sl] = out.astype(o_ref.dtype)
        else:
            o_ref[0, :, :, sl] = out.reshape(t, nb, dh).astype(o_ref.dtype)
        # CLS streaming partials = row r (see comment above)
        m_ref[0, 0, h : h + 1, :] = m[r:]
        s_ref[0, 0, h : h + 1, :] = den[r:]
        co_ref[0, 0, h : h + 1, :] = raw[r:]

    if coalesce_out:
        # one full-width store each for the output and the partials
        m_ref[0, 0] = jnp.concatenate(part_m, axis=0)  # (H, 1)
        s_ref[0, 0] = jnp.concatenate(part_s, axis=0)
        co_ref[0, 0] = jnp.concatenate(part_co, axis=0)  # (H, dh)
        if not quant_out:
            acc = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)  # (R, D)
            if nb is None:
                o_ref[0, 0] = acc
            else:
                o_ref[0] = acc.reshape(t, nb, d)

    if quant_out:
        acc = (
            jnp.concatenate(outs, axis=-1) if coalesce_out
            else scratch_ref[:, :]
        )  # (R, D) f32
        # same per-token scale rule as quant.int8_linear
        s_x = jnp.maximum(
            jnp.max(jnp.abs(acc), axis=-1, keepdims=True) / 127.0, 1e-8
        )  # (R, 1)
        q = jnp.clip(jnp.round(acc * (1.0 / s_x)), -127, 127).astype(jnp.int8)
        if nb is None:
            o_ref[0, 0] = q
            sq_ref[0, 0] = s_x
        else:
            o_ref[0] = q.reshape(t, nb, d)
            sq_ref[0] = s_x.reshape(t, nb, 1)


def merge_cls_partials(m, s, co, cls_q, cls_k, cls_v, heads: int):
    """Combine per-tile CLS partials with the CLS self-attention term.

    m/s (B, G, H, 1) f32, co (B, G, H, dh) f32; cls_q/k/v (B, D) unscaled
    -> (B, D) attention output of the CLS query over
    [cls | all patch tokens].
    """
    b, g = m.shape[:2]
    m = m[..., 0]  # (B, G, H)
    s = s[..., 0]
    d = co.shape[-1] * heads
    dh = d // heads

    cqh = cls_q.reshape(b, heads, dh).astype(jnp.float32)
    ckh = cls_k.reshape(b, heads, dh).astype(jnp.float32)
    cvh = cls_v.reshape(b, heads, dh).astype(jnp.float32)
    scale = dh**-0.5
    l_self = scale * jnp.sum(cqh * ckh, axis=-1)  # (B, H)

    m_g = jnp.maximum(jnp.max(m, axis=1), l_self)  # (B, H)
    w = jnp.exp(m - m_g[:, None, :])  # (B, G, H)
    e_self = jnp.exp(l_self - m_g)  # (B, H)
    denom = jnp.sum(s * w, axis=1) + e_self
    num = jnp.sum(co * w[..., None], axis=1) + e_self[..., None] * cvh
    return (num / denom[..., None]).reshape(b, d)


def _temporal_block(t: int, n: int) -> int:
    """Patch-block size: R = t*nb rows per tile, targeting R = 256 (the
    measured sweet spot — one (256, 256) masked dot per head beats tiny
    batched (T, T) dots and beats R = 128 tiles, BENCH_NOTES.md).

    nb must divide n and be a multiple of 8 (Pallas block constraint,
    callers guarantee n % 8 == 0 via ``_kernel_friendly``); long clips
    (256 // t < 8) fall to the minimum nb = 8 tile so R stays bounded at
    8*t rows rather than degenerating to the whole patch axis.

    Even at nb = 8 the kernel's scoped-VMEM ask is quadratic-in-R per
    unrolled head (see ``_scoped_vmem_ask``) and overruns the default
    16 MiB limit past R ~ 256 — long tiles raise the per-kernel
    ``vmem_limit_bytes`` up to ``_VMEM_LIMIT`` (divided_patch_attention);
    asks beyond that fall back to XLA via ``_kernel_friendly``."""
    nb = min(max(256 // t, 8), n)
    nb -= nb % 8
    while nb > 8 and n % nb:
        nb -= 8
    if nb < 8 or n % nb:
        nb = 8 if n % 8 == 0 else n
    return max(nb, 1)


def _rows_kernel_hg(
    qkv_ref, cls_ref, o_ref, m_ref, s_ref, co_ref, *, dh, scale, nb, t,
):
    """Head-grid temporal tile: ONE head's attention over a (T, Nb)
    patch-tube tile laid out head-major by the caller — rows are
    (R, 3*dh) packed [q|k|v] for this head only, so the q/k/v column
    slices are static and the live f32 buffers are a single head's
    (R+1, R) pair. Same math as _rows_kernel (periodic same-patch mask,
    CLS row riding as row R, streaming-softmax partials); the head loop
    moves into the Pallas grid, so the scoped-VMEM ask stops being
    quadratic-in-R *per head* and long clips (T = 128 at flagship
    heads, ~134 MiB single-tile ask) fit comfortably."""
    tile = qkv_ref[0, 0]  # (t, nb, 3*dh)
    r = t * nb
    rows = tile.reshape(r, 3 * dh)
    crow = cls_ref[0, 0]  # (1, 3*dh) this head's packed [cq|ck|cv]
    ra = r + 1
    prec = (
        jax.lax.Precision.HIGHEST if rows.dtype == jnp.float32 else _PREC
    )

    qa = jnp.concatenate([rows[:, :dh], crow[:, :dh]], axis=0)  # (RA, dh)
    k = rows[:, dh : 2 * dh]
    v = rows[:, 2 * dh :]
    ck = crow[:, dh : 2 * dh]
    cv = crow[:, 2 * dh :]

    logits = scale * jax.lax.dot_general(
        qa, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (RA, R)
    if nb > 1:
        ri = jax.lax.broadcasted_iota(jnp.int32, (ra, r), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (ra, r), 1)
        logits = logits + jnp.where(
            ((ri % nb) == (ci % nb)) | (ri == r), 0.0, -1e30
        )
    row_i = jax.lax.broadcasted_iota(jnp.int32, (ra, 1), 0)
    lc = scale * jnp.sum(
        (qa * ck).astype(jnp.float32), axis=-1, keepdims=True
    ) + jnp.where(row_i == r, -1e30, 0.0)  # CLS-query row excludes self

    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), lc)
    e_c = jnp.exp(lc - m)
    e_p = jnp.exp(logits - m)
    den = jnp.sum(e_p, axis=-1, keepdims=True) + e_c
    raw = jax.lax.dot_general(
        e_p.astype(rows.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (RA, dh)
    out = (raw[:r] + e_c[:r] * cv.astype(jnp.float32)) / den[:r]
    o_ref[0, 0] = out.reshape(t, nb, dh).astype(o_ref.dtype)
    m_ref[0, 0] = m[r:]
    s_ref[0, 0] = den[r:]
    co_ref[0, 0] = raw[r:]


def _time_attention_headgrid(qkv, cls_row, *, heads, interpret):
    """Temporal divided attention with the head loop in the Pallas grid.

    Costs one extra XLA pass over qkv (head-major rearrange in, output
    rearrange back) that the single-tile kernel avoids — acceptable for
    the long-clip shapes this path exists for, and far cheaper than the
    XLA full-attention fallback it replaces (1.7x at T = 64,
    BENCH_NOTES r5). Returns the same (out, (m, s, co)) contract as the
    single-tile path."""
    b, t, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = dh**-0.5
    nb = _temporal_block(t, n)
    g = n // nb
    r = t * nb

    # head-major packed layout: (B, H, T, N, [q|k|v] * dh)
    qh = (
        qkv.reshape(b, t, n, 3, heads, dh)
        .transpose(0, 4, 1, 2, 3, 5)
        .reshape(b, heads, t, n, 3 * dh)
    )
    ch = (
        cls_row.reshape(b, 3, heads, dh)
        .transpose(0, 2, 1, 3)
        .reshape(b, heads, 1, 3 * dh)
    )

    kernel = functools.partial(_rows_kernel_hg, dh=dh, scale=scale, nb=nb, t=t)
    part = lambda w: pl.BlockSpec(  # noqa: E731
        (1, 1, 1, w), lambda i, h, j: (i, j, h, 0), memory_space=pltpu.VMEM
    )
    kw = {}
    if r > 256:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _headgrid_vmem_ask(r) + 16 * 1024 * 1024, _VMEM_LIMIT
            )
        )
    out, m, s, co = pl.pallas_call(
        kernel,
        grid=(b, heads, g),
        in_specs=[
            pl.BlockSpec(
                (1, 1, t, nb, 3 * dh),
                lambda i, h, j: (i, h, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 3 * dh),
                lambda i, h, j: (i, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, t, nb, dh),
                lambda i, h, j: (i, h, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            part(1),
            part(1),
            part(dh),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, heads, t, n, dh), qkv.dtype),
            jax.ShapeDtypeStruct((b, g, heads, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, g, heads, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, g, heads, dh), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )(qh, ch)
    return out.transpose(0, 2, 3, 1, 4).reshape(b, t, n, d), (m, s, co)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "heads", "interpret", "quant_out", "fused_den", "coalesce_out",
        "head_grid",
    ),
)
def divided_patch_attention(
    qkv,
    cls_k,
    cls_v,
    cls_q=None,
    *,
    mode: str,
    heads: int,
    interpret: bool = False,
    quant_out: bool = False,
    fused_den: bool = False,
    coalesce_out: bool = False,
    head_grid: bool | None = None,
):
    """Patch-token divided attention on packed qkv (+ CLS partials).

    Args:
        qkv: (B, T, N, 3D) packed [q|k|v] activations (post qkv matmul,
            un-scaled q).
        cls_k / cls_v: (B, D) the CLS token's key/value rows.
        cls_q: optional (B, D) CLS query (un-scaled); when given, the
            kernels also emit streaming-softmax partials of the CLS query
            over the patch keys, merged with ``merge_cls_partials``.
        quant_out: emit the patch output pre-quantized for an int8
            projection matmul: returns (out int8, s_x (B, T, N, 1) f32)
            instead of a bf16 out (see ``quant.int8_linear_prequant``).
    Returns:
        (B, T, N, D) patch output (int8 + scales when quant_out), and —
        when cls_q is given — (m, s, co) partials (B, G, H, 1/1/dh).
    """
    b, t, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = dh**-0.5
    want_partials = cls_q is not None
    if cls_q is None:
        cls_q = jnp.zeros_like(cls_k)

    # long tiles (r > 256: T > 32 temporal tubes, or very large patch
    # grids) overrun the default 16 MiB scoped-VMEM limit (the per-head
    # logits/exp stack buffers are not reused across the unrolled head
    # loop, _scoped_vmem_ask) — raise the per-kernel limit toward the
    # 128 MiB physical VMEM instead of falling back to XLA
    r_tile = n if mode == "space" else t * _temporal_block(t, n)
    compiler_params = None
    if r_tile > 256:
        ask = _scoped_vmem_ask(r_tile, heads) + 16 * 1024 * 1024
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=min(ask, _VMEM_LIMIT)
        )

    if mode == "space":
        r = n
        kernel = functools.partial(
            _rows_kernel, heads=heads, dh=dh, scale=scale, nb=None, t=t,
            quant_out=quant_out, fused_den=fused_den, coalesce_out=coalesce_out,
        )
        grid = (b, t)
        g = t
        qkv_spec = pl.BlockSpec((1, 1, n, d3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        sq_spec = pl.BlockSpec((1, 1, n, 1), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    else:
        nb = _temporal_block(t, n)
        r = t * nb
        kernel = functools.partial(
            _rows_kernel, heads=heads, dh=dh, scale=scale, nb=nb, t=t,
            quant_out=quant_out, fused_den=fused_den, coalesce_out=coalesce_out,
        )
        grid = (b, n // nb)
        g = n // nb
        qkv_spec = pl.BlockSpec((1, t, nb, d3), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, t, nb, d), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
        sq_spec = pl.BlockSpec((1, t, nb, 1), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)

    part_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (1, 1, heads, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    cls_spec = pl.BlockSpec((1, 1, d3), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    cls_row = jnp.concatenate([cls_q, cls_k, cls_v], axis=-1)[:, None, :]
    out_specs = [out_spec, part_spec(1), part_spec(1), part_spec(dh)]
    out_shape = [
        jax.ShapeDtypeStruct((b, t, n, d), jnp.int8 if quant_out else qkv.dtype),
        jax.ShapeDtypeStruct((b, g, heads, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, g, heads, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, g, heads, dh), jnp.float32),
    ]
    scratch_shapes = []
    if quant_out:
        out_specs.append(sq_spec)
        out_shape.append(jax.ShapeDtypeStruct((b, t, n, 1), jnp.float32))
        if not coalesce_out:  # the coalesced path accumulates in VREGs
            scratch_shapes = [pltpu.VMEM((r, d), jnp.float32)]
    kw = {} if compiler_params is None else {"compiler_params": compiler_params}
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, cls_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kw,
    )(qkv, cls_row)
    if quant_out:
        out, m, s, co, sq = res
        out = (out, sq)
    else:
        out, m, s, co = res
    if want_partials:
        return out, (m, s, co)
    return out
