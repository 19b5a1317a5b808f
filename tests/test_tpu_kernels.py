"""Real-TPU kernel tests (skipped off-TPU; CPU coverage is interpret-mode
in test_models.py pallas_interpret tests). Run on a TPU host with:
    python -m pytest tests/test_tpu_kernels.py -q
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

tpu_only = pytest.mark.skipif(
    jax.default_backend() in ("cpu", "gpu"), reason="needs a TPU backend"
)


@tpu_only
def test_divided_attention_tpu_parity():
    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        divided_patch_attention,
    )

    b, t, n, heads, dh = 2, 4, 256, 16, 64
    d = heads * dh
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(b, t, n, 3 * d)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    ck = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)).astype(jnp.bfloat16)
    cv = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)).astype(jnp.bfloat16)

    for mode in ("space", "time"):
        got = np.asarray(
            divided_patch_attention(qkv, ck, cv, mode=mode, heads=heads)
        ).astype(np.float32)
        want = np.asarray(
            divided_patch_attention(qkv, ck, cv, mode=mode, heads=heads, interpret=True)
        ).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=2e-2)  # f32 vs MXU bf16-ish


@tpu_only
def test_divided_attention_quant_out_tpu_parity():
    """Compiled quant_out (in-VMEM int8 output + per-token scales) vs
    interpret mode: same int8 codes up to MXU-precision rounding at the
    quantization boundary, scales allclose."""
    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        divided_patch_attention,
    )

    b, t, n, heads, dh = 2, 4, 256, 16, 64
    d = heads * dh
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(b, t, n, 3 * d)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    ck = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)).astype(jnp.bfloat16)
    cv = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)).astype(jnp.bfloat16)
    cq = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)).astype(jnp.bfloat16)

    for mode in ("space", "time"):
        (got_q, got_s), _ = divided_patch_attention(
            qkv, ck, cv, cq, mode=mode, heads=heads, quant_out=True
        )
        (want_q, want_s), _ = divided_patch_attention(
            qkv, ck, cv, cq, mode=mode, heads=heads, quant_out=True, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(want_s), rtol=5e-2, err_msg=mode
        )
        # dequantized outputs agree to bf16-MXU noise + one quant step
        got = np.asarray(got_q, np.float32) * np.asarray(got_s)
        want = np.asarray(want_q, np.float32) * np.asarray(want_s)
        np.testing.assert_allclose(got, want, atol=2e-2, err_msg=mode)


@tpu_only
def test_backbone_backends_agree_tpu():
    from dataclasses import replace

    from helping_hand_for_egocentric_videos_tpu.models import (
        SpaceTimeConfig,
        init_spacetime_params,
        spacetime_forward,
    )

    cfg_pl = SpaceTimeConfig(
        img_size=112, patch_size=14, width=128, depth=2, heads=2, num_frames=2,
        attention_backend="pallas",
    )
    cfg_xla = replace(cfg_pl, attention_backend="xla")
    params = init_spacetime_params(jax.random.PRNGKey(0), cfg_pl)
    video = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 112, 112, 3)).astype(np.float32)
    )
    a = spacetime_forward(params, cfg_xla, video, use_remat=False, dtype=jnp.float32)[1]
    b = spacetime_forward(params, cfg_pl, video, use_remat=False, dtype=jnp.float32)[1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-2)
