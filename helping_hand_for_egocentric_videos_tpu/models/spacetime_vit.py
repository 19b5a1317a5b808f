"""SpaceTimeTransformer (TimeSformer, 'frozen-in-time' style) in JAX.

The frozen LaviLa visual tower: a ViT with divided space-time attention
over ``1 + T*N`` tokens (CLS + T frames x N patches). Semantics match the
reference exactly (model/LaviLa.py:194-581):

- ``VarAttention`` (L:226-283): one projection set serves both the spatial
  and temporal attention. The CLS query attends to *all* tokens; patch
  queries attend within their frame (space) or within their patch tube
  (time), with the CLS key/value broadcast-prepended to every group.
- ``SpaceTimeBlock`` (L:345-390): time-attn on norm3(x) -> time_residual =
  x + out; space-attn on norm1(time_residual); 'frozen-in-time' residual
  space_residual = **x** + space_out (not time_residual); MLP on norm2.
- Patch embedding is a stride-P conv without bias (ln_pre=True,
  L:200-223); positional embedding = CLS embed + per-frame tile of the
  spatial table + repeat-interleaved temporal table (L:546-557); ln_pre
  before the blocks; final LayerNorm(eps=1e-6).

TPU-first design choices:
- channel-last input (B, T, H, W, C); the patchifier is a reshape + one
  (P*P*C, D) matmul — a pure MXU op, no conv lowering.
- the 24 blocks run under ``lax.scan`` over stacked params, wrapped in
  ``jax.checkpoint`` (rematerialisation) to mirror the reference's
  ``use_checkpoint=True`` and keep HBM flat at 16-frame eval.
- the CLS token rides separately from the patch tokens through the whole
  tower (LN/MLP are per-token, so the math is unchanged), letting the
  Pallas divided-attention kernels consume the packed patch qkv with zero
  HBM slicing; the XLA fallback path concatenates internally.
- divided attention on TPU runs in the Pallas kernels of
  ops/divided_attention.py (which also emit the CLS query's
  streaming-softmax partials); elsewhere a grouped-einsum XLA
  implementation with identical semantics is used.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from .layers import layer_norm, layer_norm_init, linear, linear_init, quick_gelu

__all__ = ["SpaceTimeConfig", "init_spacetime_params", "spacetime_forward"]


@dataclass(frozen=True)
class SpaceTimeConfig:
    img_size: int = 224
    patch_size: int = 14
    in_chans: int = 3
    width: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    num_frames: int = 4
    ln_eps: float = 1e-6  # timm default eps for TimeSformer norms
    use_quick_gelu: bool = True  # CLIP-initialised towers use QuickGELU
    # 'auto' -> Pallas fused attention on TPU, plain XLA elsewhere
    attention_backend: str = "auto"
    # kernel-tail A/B (BENCH_NOTES r4): take the softmax denominator from
    # an appended ones column of the value dot, fusing exp straight into
    # the bf16 probs (fewer VPU passes over the f32 logits)
    fused_den_attention: bool = False
    # Coalesce the attention kernels' per-head lane-sliced output/partial
    # stores into one full-width store each (kernel-tail experiment #2,
    # BENCH_NOTES r4). Bit-exact vs the per-head store schedule; measured
    # +4.0% bf16 / +4.7% int8 on the full 16f eval (reproduced twice), so
    # on by default. Policy is per-mode for A/B: False/'off' = never,
    # True/'all' = both modes, 'time'/'space' = that attention mode only.
    coalesced_epilogue: "bool | str" = True

    @property
    def patches_per_frame(self) -> int:
        return (self.img_size // self.patch_size) ** 2


def _init_attn(key, dim: int, zero_init: bool):
    """VarAttention params: packed qkv + out proj (model/LaviLa.py:226-244).

    ``zero_init`` reproduces time_init='zeros': qkv zeroed, proj weight
    filled with 1 (L:236-242).
    """
    k1, k2 = jax.random.split(key)
    p = {
        "qkv": linear_init(k1, dim, 3 * dim),
        "proj": linear_init(k2, dim, dim),
    }
    if zero_init:
        p["qkv"]["w"] = jnp.zeros_like(p["qkv"]["w"])
        p["qkv"]["b"] = jnp.zeros_like(p["qkv"]["b"])
        p["proj"]["w"] = jnp.ones_like(p["proj"]["w"])
        p["proj"]["b"] = jnp.zeros_like(p["proj"]["b"])
    return p


def _init_block(key, cfg: SpaceTimeConfig):
    ks = jax.random.split(key, 4)
    dim, hidden = cfg.width, cfg.width * cfg.mlp_ratio
    return {
        "norm1": layer_norm_init(dim),
        "attn": _init_attn(ks[0], dim, zero_init=False),
        "norm3": layer_norm_init(dim),
        "timeattn": _init_attn(ks[1], dim, zero_init=True),
        "norm2": layer_norm_init(dim),
        "mlp_fc1": linear_init(ks[2], dim, hidden),
        "mlp_fc2": linear_init(ks[3], hidden, dim),
    }


def init_spacetime_params(key, cfg: SpaceTimeConfig):
    keys = jax.random.split(key, cfg.depth + 3)
    blocks = [_init_block(keys[i], cfg) for i in range(cfg.depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.in_chans
    return {
        # conv patchifier stored as a flat (P*P*C, D) matmul weight, no bias
        "patch_embed": {"w": jax.random.normal(keys[-3], (patch_dim, cfg.width)) * 0.02},
        "cls_token": jnp.zeros((1, 1, cfg.width)),
        "pos_embed": jax.random.normal(keys[-2], (1, cfg.patches_per_frame + 1, cfg.width)) * 0.02,
        "temporal_embed": jnp.zeros((1, cfg.num_frames, cfg.width)),
        "ln_pre": layer_norm_init(cfg.width),
        "blocks": stacked,
        "norm": layer_norm_init(cfg.width),
    }


def _attend(q, k, v):
    """softmax(q k^T) v with f32 softmax. q is pre-scaled (L:252)."""
    logits = jnp.einsum("...qd,...kd->...qk", q, k)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v)


def _use_pallas(backend: str) -> bool:
    if backend == "pallas":
        return True
    if backend == "auto":
        return jax.default_backend() not in ("cpu", "gpu")
    return False


def _var_attention_pallas(p, x_cls, x_p, t: int, n: int, heads: int, mode: str, interpret=False, fused_den=False, coalesce_out=False):
    """Divided attention via the packed-qkv Pallas kernel on a split
    (cls, patches) representation: the patch qkv matmul's (B, T*N, 3D)
    output reshapes for free into the kernel's (B, T, N, 3D) tile — no
    token slicing, head transposes or output concat ever touch HBM. The
    CLS query's full-sequence attention comes from per-tile partials the
    kernels emit, merged in XLA (ops/divided_attention.py).

    Returns (cls_out (B, 1, D), patch_out (B, T*N, D)), post-projection.
    """
    from ..ops.divided_attention import divided_patch_attention, merge_cls_partials

    if isinstance(x_p, tuple):  # pre-quantized patch stream (ln_int8 path)
        from ..models.quant import int8_linear_prequant

        x_q, s_x = x_p
        b, _, d = x_q.shape
        qkv_p = int8_linear_prequant(
            p["qkv"], x_q, s_x, out_dtype=x_cls.dtype
        ).reshape(b, t, n, 3 * d)
    else:
        b, _, d = x_p.shape
        qkv_p = linear(p["qkv"], x_p).reshape(b, t, n, 3 * d)
    qkv_c = linear(p["qkv"], x_cls)[:, 0]  # (B, 3D)

    cls_q = qkv_c[:, :d]
    cls_k = qkv_c[:, d : 2 * d]
    cls_v = qkv_c[:, 2 * d :]
    # pure-int8 proj (no mixed-precision q_on flag): have the kernel emit
    # its output pre-quantized with per-token scales, so the proj matmul
    # consumes it directly (kills the XLA-side reduce_max + convert and
    # halves the kernel's HBM output write; models/quant.py)
    quant_out = "w_q" in p["proj"] and "q_on" not in p["proj"]
    out_patch, (m, s, co) = divided_patch_attention(
        qkv_p, cls_k, cls_v, cls_q, mode=mode, heads=heads, interpret=interpret,
        quant_out=quant_out, fused_den=fused_den, coalesce_out=coalesce_out,
    )
    cls_out = merge_cls_partials(m, s, co, cls_q, cls_k, cls_v, heads)
    cls_out = cls_out.astype(x_cls.dtype)[:, None, :]

    if quant_out:
        from ..models.quant import int8_linear_prequant

        out_q, s_x = out_patch
        patch_proj = int8_linear_prequant(
            p["proj"], out_q.reshape(b, t * n, d), s_x.reshape(b, t * n, 1),
            out_dtype=x_cls.dtype,
        )
    else:
        patch_proj = linear(p["proj"], out_patch.reshape(b, t * n, d))

    return linear(p["proj"], cls_out), patch_proj


def _kernel_friendly(n: int, d: int, heads: int, t: int, mode: str = "space") -> bool:
    """Shapes the Mosaic kernels compile well for: full-lane tiles,
    64-multiple head dims, and an unrolled head loop that fits VMEM.

    Long temporal tiles (R = t*nb > 256 rows, i.e. t > 32 at the minimum
    nb = 8) overrun the DEFAULT 16 MiB scoped-VMEM limit — the per-head
    (R+1, R) f32 logits/exp stack buffers are not reused across the
    unrolled head loop (MEASURED on v5e: t=64/R=512 asks 33.65 MiB; a
    q-chunked rewrite still asked 31.03 MiB — BENCH_NOTES r5). The kernel
    raises its own ``vmem_limit_bytes`` toward the 128 MiB physical VMEM
    for those tiles (ops/divided_attention._scoped_vmem_ask), which
    admits mode='time' through R = 512 (t = 64 at nb = 8) on flagship
    heads; asks past ``_VMEM_LIMIT`` (t = 128 would need ~134 MiB) still
    route ONLY the temporal attention to the XLA path, while spatial
    tiles are per-frame and T-independent."""
    dh = d // heads
    if mode == "time":
        from ..ops.divided_attention import (
            _VMEM_LIMIT,
            _scoped_vmem_ask,
            _temporal_block,
        )

        r = t * _temporal_block(t, n)
        if _scoped_vmem_ask(r, heads) + 16 * 1024 * 1024 > _VMEM_LIMIT:
            return False
    return dh % 64 == 0 and n % 8 == 0 and n >= 32 and heads <= 16 and t <= 128


def _var_attention_split(p, x_cls, x_p, t, n, heads, mode, backend, fused_den=False, coalesce_out=False):
    """Divided attention on the split (cls, patches) representation.

    mode='space': patch tokens attend within their frame (groups of N),
    mode='time' : patch tokens attend within their patch tube (groups of T);
    the CLS key/value is prepended to every group, and the CLS query
    attends over all 1+T*N tokens (model/LaviLa.py:246-276).
    """
    if backend == "pallas_interpret":  # CPU-testable kernel path
        return _var_attention_pallas(
            p, x_cls, x_p, t, n, heads, mode, interpret=True,
            fused_den=fused_den, coalesce_out=coalesce_out,
        )
    if isinstance(x_p, tuple) or (
        _use_pallas(backend) and _kernel_friendly(n, x_p.shape[-1], heads, t, mode)
    ):
        # a tuple x_p is the ln_int8 pre-quantized stream — the caller
        # (_block) only produces it when this pallas path is taken
        return _var_attention_pallas(p, x_cls, x_p, t, n, heads, mode, fused_den=fused_den, coalesce_out=coalesce_out)
    x = jnp.concatenate([x_cls, x_p], axis=1)
    out = _var_attention(p, x, t, n, heads, mode)
    return out[:, :1], out[:, 1:]


def _var_attention(p, x, t: int, n: int, heads: int, mode: str):
    """Reference XLA implementation over the full (B, 1 + T*N, D) tokens."""
    b, seq, d = x.shape
    dh = d // heads
    qkv = linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(z):  # (B, S, D) -> (B, H, S, dh)
        return z.reshape(b, seq, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    q = q * (dh**-0.5)

    cls_q, q_ = q[:, :, :1], q[:, :, 1:]
    cls_k, k_ = k[:, :, :1], k[:, :, 1:]
    cls_v, v_ = v[:, :, :1], v[:, :, 1:]

    # CLS attends over everything
    cls_out = _attend(cls_q, k, v)  # (B, H, 1, dh)

    if mode == "space":
        grp, within = t, n  # groups of one frame
        reshape = lambda z: z.reshape(b, heads, t, n, dh)
        unshape = lambda z: z.reshape(b, heads, t * n, dh)
    else:  # time
        grp, within = n, t  # groups of one patch tube

        def reshape(z):
            return z.reshape(b, heads, t, n, dh).transpose(0, 1, 3, 2, 4)

        def unshape(z):
            return z.transpose(0, 1, 3, 2, 4).reshape(b, heads, t * n, dh)

    qg = reshape(q_)  # (B, H, G, W, dh)
    kg = reshape(k_)
    vg = reshape(v_)
    cls_k_b = jnp.broadcast_to(cls_k[:, :, None], (b, heads, grp, 1, dh))
    cls_v_b = jnp.broadcast_to(cls_v[:, :, None], (b, heads, grp, 1, dh))
    kg = jnp.concatenate([cls_k_b, kg], axis=3)  # (B, H, G, 1+W, dh)
    vg = jnp.concatenate([cls_v_b, vg], axis=3)

    out = _attend(qg, kg, vg)  # (B, H, G, W, dh)
    out = unshape(out)
    out = jnp.concatenate([cls_out, out], axis=2)  # (B, H, S, dh)
    out = out.transpose(0, 2, 1, 3).reshape(b, seq, d)
    return linear(p["proj"], out)


def _coalesce_for(flag, mode: str) -> bool:
    """Resolve the per-mode coalesced-epilogue policy (SpaceTimeConfig)."""
    if isinstance(flag, str):
        return flag == "all" or mode in flag.split("+")
    return bool(flag)


def _block(p, x, cfg: SpaceTimeConfig, t: int, n: int):
    """One SpaceTimeBlock on the split (x_cls, x_p) representation.

    LayerNorm/MLP are per-token, so applying them to the two parts
    separately is exactly the reference math on the concatenated sequence.
    """
    eps = cfg.ln_eps
    act = quick_gelu if cfg.use_quick_gelu else jax.nn.gelu
    be = cfg.attention_backend
    x_cls, x_p = x
    d = x_p.shape[-1]

    def pure_int8(lin):
        return "w_q" in lin and "q_on" not in lin

    # int8 fast path: fuse [LayerNorm -> per-token quantize] (and
    # [QuickGELU -> quantize]) into Pallas kernels so the quantized
    # matmuls consume int8 codes directly and the bf16 intermediates
    # never round-trip HBM (ops/act_quant.py; ~10% of the int8 eval iter)
    interp = be == "pallas_interpret"
    # per-mode: long clips stay in Pallas through t = 64 (the kernel
    # raises its own vmem_limit_bytes for R > 256 tiles); only asks past
    # _VMEM_LIMIT (t = 128) drop the temporal kernel to the XLA path,
    # spatial tiles are T-independent and always stay (_kernel_friendly)
    ok = {
        m: interp or (_use_pallas(be) and _kernel_friendly(n, d, heads=cfg.heads, t=t, mode=m))
        for m in ("time", "space")
    }
    lanes_ok = d % 128 == 0
    int8_qkv = pure_int8(p["timeattn"]["qkv"]) and pure_int8(p["attn"]["qkv"])
    q_attn = {m: ok[m] and lanes_ok and int8_qkv for m in ("time", "space")}
    q_mlp = (
        ok["space"]  # the act-quant kernels tile per token: no t bound
        and lanes_ok
        and cfg.use_quick_gelu
        and pure_int8(p["mlp_fc1"])
        and pure_int8(p["mlp_fc2"])
    )
    if any(q_attn.values()) or q_mlp:
        from ..ops.act_quant import layer_norm_int8, quick_gelu_int8

    def norm_patch(np_, z, mode):
        if q_attn[mode]:
            return layer_norm_int8(np_, z, eps, interpret=interp)
        return layer_norm(np_, z, eps)

    tc, tp = _var_attention_split(
        p["timeattn"],
        layer_norm(p["norm3"], x_cls, eps),
        norm_patch(p["norm3"], x_p, "time"),
        t, n, cfg.heads, "time", be, fused_den=cfg.fused_den_attention,
        coalesce_out=_coalesce_for(cfg.coalesced_epilogue, "time"),
    )
    tr_cls, tr_p = x_cls + tc, x_p + tp

    sc, sp = _var_attention_split(
        p["attn"],
        layer_norm(p["norm1"], tr_cls, eps),
        norm_patch(p["norm1"], tr_p, "space"),
        t, n, cfg.heads, "space", be, fused_den=cfg.fused_den_attention,
        coalesce_out=_coalesce_for(cfg.coalesced_epilogue, "space"),
    )
    # 'frozen-in-time' residual: from x, not time_residual (L:383-384)
    sr_cls, sr_p = x_cls + sc, x_p + sp

    def mlp(z, wide=False):
        if wide and q_mlp:
            from ..models.quant import int8_linear_prequant

            h_q, h_s = layer_norm_int8(p["norm2"], z, eps, interpret=interp)
            a = int8_linear_prequant(p["mlp_fc1"], h_q, h_s, out_dtype=z.dtype)
            g_q, g_s = quick_gelu_int8(a, interpret=interp)
            return z + int8_linear_prequant(p["mlp_fc2"], g_q, g_s, out_dtype=z.dtype)
        h = layer_norm(p["norm2"], z, eps)
        return z + linear(p["mlp_fc2"], act(linear(p["mlp_fc1"], h)))

    return mlp(sr_cls), mlp(sr_p, wide=True)


def patchify(params, cfg: SpaceTimeConfig, video):
    """(B, T, H, W, C) uint8/float -> (B, T*N, D) patch tokens."""
    b, t, h, w, c = video.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    x = video.reshape(b, t, gh, p, gw, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (B, T, gh, gw, p, p, C)
    x = x.reshape(b, t * gh * gw, p * p * c)
    return x @ params["patch_embed"]["w"]


@partial(jax.jit, static_argnames=("cfg", "use_remat", "dtype"))
def spacetime_forward(
    params,
    cfg: SpaceTimeConfig,
    video,
    *,
    use_remat: bool = True,
    dtype=jnp.bfloat16,
):
    """Forward pass.

    Args:
        video: (B, T, H, W, C) float, already normalised. T may be any
            value <= the temporal-embedding length (variable frame counts,
            L:539-557); eval inflates the embedding first.
    Returns:
        (cls (B, D), tokens (B, 1+T*N, D)) — both post final-LayerNorm,
        matching ``forward_features`` (L:569-573). f32 outputs.
    """
    b, t = video.shape[:2]
    n = cfg.patches_per_frame

    def cast(path, a):
        # int8-quantized weights and their scales keep their dtypes
        if not jnp.issubdtype(a.dtype, jnp.floating):
            return a
        if any(getattr(p, "key", None) == "s_w" for p in path):
            return a
        return a.astype(dtype)

    params = jax.tree_util.tree_map_with_path(cast, params)
    x_p = patchify(params, cfg, video.astype(dtype))  # (B, T*N, D)
    x_cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.width)).astype(dtype)

    pos_spatial = jnp.tile(params["pos_embed"][:, 1:, :], (1, t, 1))  # (1, T*N, D)
    pos_temporal = jnp.repeat(params["temporal_embed"][:, :t, :], n, axis=1)
    x_p = x_p + (pos_spatial + pos_temporal).astype(dtype)
    x_cls = x_cls + params["pos_embed"][:, :1, :].astype(dtype)
    # ln_pre is a default nn.LayerNorm (eps 1e-5), unlike the timm-style
    # 1e-6 block norms (model/LaviLa.py:440,456-457)
    x_cls = layer_norm(params["ln_pre"], x_cls, 1e-5)
    x_p = layer_norm(params["ln_pre"], x_p, 1e-5)

    block = _block
    if use_remat:
        block = jax.checkpoint(_block, static_argnums=(2, 3, 4))

    def body(x, blk):
        return block(blk, x, cfg, t, n), None

    (x_cls, x_p), _ = jax.lax.scan(body, (x_cls, x_p), params["blocks"])

    x = jnp.concatenate([x_cls, x_p], axis=1)
    x = layer_norm(params["norm"], x.astype(jnp.float32), cfg.ln_eps)
    return x[:, 0], x
