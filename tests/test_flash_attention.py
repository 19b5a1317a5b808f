"""Pallas fused attention: correctness vs the einsum reference.

Runs in interpreter mode so it works on CPU; on a real TPU the same
kernel is exercised by the backbone (attention_backend='pallas').
"""

import numpy as np
import jax
import jax.numpy as jnp

from helping_hand_for_egocentric_videos_tpu.ops.flash_attention import (
    fused_group_attention,
)


def reference(q, k, v):
    logits = np.einsum("gqd,gkd->gqk", q, k).astype(np.float64)
    m = logits.max(-1, keepdims=True)
    e = np.exp(logits - m)
    p = e / e.sum(-1, keepdims=True)
    return np.einsum("gqk,gkd->gqd", p, v)


def test_fused_attention_spatial_shape(rng):
    g, sq, sk, dh = 8, 256, 257, 64
    q = rng.normal(size=(g, sq, dh)).astype(np.float32) * 0.1
    k = rng.normal(size=(g, sk, dh)).astype(np.float32) * 0.1
    v = rng.normal(size=(g, sk, dh)).astype(np.float32)
    out = fused_group_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), reference(q, k, v), atol=2e-5)


def test_fused_attention_temporal_shape(rng):
    g, sq, sk, dh = 64, 16, 17, 64
    q = rng.normal(size=(g, sq, dh)).astype(np.float32) * 0.1
    k = rng.normal(size=(g, sk, dh)).astype(np.float32) * 0.1
    v = rng.normal(size=(g, sk, dh)).astype(np.float32)
    out = fused_group_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True, group_block=16
    )
    np.testing.assert_allclose(np.asarray(out), reference(q, k, v), atol=2e-5)


def _divided_oracle(qkv, cls_k, cls_v, mode, heads):
    """Numpy oracle for divided_patch_attention."""
    b, t, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    q, k, v = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]

    def split(z):  # (B,T,N,D) -> (B,H,T,N,dh)
        return z.reshape(b, t, n, heads, dh).transpose(0, 3, 1, 2, 4)

    q, k, v = split(q) * dh**-0.5, split(k), split(v)
    ck = cls_k.reshape(b, heads, dh)
    cv = cls_v.reshape(b, heads, dh)
    out = np.zeros((b, heads, t, n, dh), np.float64)
    for bi in range(b):
        for h in range(heads):
            if mode == "space":
                for ti in range(t):
                    kk = np.concatenate([ck[bi, h][None], k[bi, h, ti]], 0)
                    vv = np.concatenate([cv[bi, h][None], v[bi, h, ti]], 0)
                    out[bi, h, ti] = reference(
                        q[bi, h, ti][None], kk[None], vv[None]
                    )[0]
            else:
                for ni in range(n):
                    kk = np.concatenate([ck[bi, h][None], k[bi, h, :, ni]], 0)
                    vv = np.concatenate([cv[bi, h][None], v[bi, h, :, ni]], 0)
                    out[bi, h, :, ni] = reference(
                        q[bi, h, :, ni][None], kk[None], vv[None]
                    )[0]
    return out.transpose(0, 2, 3, 1, 4).reshape(b, t, n, d)


def test_divided_attention_kernel(rng):
    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        divided_patch_attention,
    )

    b, t, n, heads, dh = 2, 3, 4, 4, 8
    d = heads * dh
    qkv = rng.normal(size=(b, t, n, 3 * d)).astype(np.float32) * 0.3
    cls_k = rng.normal(size=(b, d)).astype(np.float32)
    cls_v = rng.normal(size=(b, d)).astype(np.float32)
    for mode in ("space", "time"):
        got = divided_patch_attention(
            jnp.asarray(qkv),
            jnp.asarray(cls_k),
            jnp.asarray(cls_v),
            mode=mode,
            heads=heads,
            patch_block=2,
            interpret=True,
        )
        want = _divided_oracle(qkv, cls_k, cls_v, mode, heads)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_backbone_pallas_matches_xla(rng):
    # whole-backbone parity between attention backends (interpreted Pallas)
    from dataclasses import replace

    from helping_hand_for_egocentric_videos_tpu.models import (
        SpaceTimeConfig,
        init_spacetime_params,
        spacetime_forward,
    )
    from helping_hand_for_egocentric_videos_tpu.ops import divided_attention as da
    import functools

    cfg_xla = SpaceTimeConfig(
        img_size=28, patch_size=14, width=32, depth=2, heads=4, num_frames=2,
        attention_backend="xla",
    )
    cfg_pl = replace(cfg_xla, attention_backend="pallas_interpret")
    params = init_spacetime_params(jax.random.PRNGKey(0), cfg_xla)
    video = jnp.asarray(rng.normal(size=(2, 2, 28, 28, 3)).astype(np.float32))

    a = spacetime_forward(params, cfg_xla, video, use_remat=False, dtype=jnp.float32)[1]
    b = spacetime_forward(params, cfg_pl, video, use_remat=False, dtype=jnp.float32)[1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
