"""Int8 eval-quantization mechanics.

Validates quantization error bounds and that the quantized backbone's
embeddings stay directionally faithful to the f32 path on a tiny model
(real-weight retrieval parity is a TODO for when released weights are
available).
"""

import numpy as np
import jax
import jax.numpy as jnp

from helping_hand_for_egocentric_videos_tpu.models import (
    SpaceTimeConfig,
    init_spacetime_params,
    spacetime_forward,
)
from helping_hand_for_egocentric_videos_tpu.models.quant import (
    int8_linear,
    quantize_lavila_params,
    quantize_linear_params,
)


def test_int8_linear_error_bound(rng):
    d_in, d_out, n = 64, 32, 16
    w = rng.normal(size=(d_in, d_out)).astype(np.float32) * 0.05
    b = rng.normal(size=(d_out,)).astype(np.float32) * 0.01
    x = rng.normal(size=(n, d_in)).astype(np.float32)
    qp = quantize_linear_params({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    assert qp["w_q"].dtype == jnp.int8
    y_q = np.asarray(int8_linear(qp, jnp.asarray(x)))
    y = x @ w + b
    rel = np.linalg.norm(y_q - y) / np.linalg.norm(y)
    assert rel < 0.02, rel  # ~1% relative error for int8 symmetric quant


def test_quantized_backbone_embeddings_close(rng):
    cfg = SpaceTimeConfig(img_size=28, patch_size=14, width=64, depth=2, heads=4, num_frames=2)
    params = init_spacetime_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_lavila_params({"visual": params})["visual"]
    assert qparams["blocks"]["attn"]["qkv"]["w_q"].dtype == jnp.int8
    assert qparams["blocks"]["mlp_fc1"]["w_q"].shape == (2, 64, 256)

    video = jnp.asarray(rng.normal(size=(2, 2, 28, 28, 3)).astype(np.float32))
    cls_f, tok_f = spacetime_forward(params, cfg, video, use_remat=False, dtype=jnp.float32)
    cls_q, tok_q = spacetime_forward(qparams, cfg, video, use_remat=False, dtype=jnp.float32)

    def cos(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))

    c = cos(cls_f, cls_q)
    assert (c > 0.99).all(), c
    ct = cos(tok_f.reshape(-1, 64), tok_q.reshape(-1, 64))
    assert np.mean(ct) > 0.98, np.mean(ct)


def test_mixed_linear_per_layer_dispatch(rng):
    """quantize with a threshold -> stacked families carry q_on + retained
    w; under a scan, q_on layers produce int8 outputs and fallback layers
    reproduce the full-precision matmul exactly."""
    from helping_hand_for_egocentric_videos_tpu.models.quant import mixed_linear

    from helping_hand_for_egocentric_videos_tpu.models.quant import (
        _quantize_stacked,
    )

    w = rng.normal(size=(2, 16, 8)).astype(np.float32) * 0.05
    b = rng.normal(size=(2, 8)).astype(np.float32) * 0.01
    x = rng.normal(size=(4, 16)).astype(np.float32)
    qp = _quantize_stacked({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                           score=jnp.asarray([1.0, 100.0]), threshold=8.0)
    assert "q_on" in qp and "w" in qp
    assert bool(qp["q_on"][0]) and not bool(qp["q_on"][1])

    def body(carry, layer_p):
        return carry, mixed_linear(layer_p, jnp.asarray(x))

    _, ys = jax.lax.scan(body, 0, qp)
    # fallback layer == exact f32 matmul
    np.testing.assert_allclose(np.asarray(ys[1]), x @ w[1] + b[1], rtol=1e-6, atol=1e-7)
    # quantized layer == int8_linear on that layer's slice
    lq = {"w_q": qp["w_q"][0], "s_w": qp["s_w"][0], "b": qp["b"][0]}
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(int8_linear(lq, jnp.asarray(x))), rtol=1e-6, atol=1e-7)

    # all-quantized: no fallback leaves at all
    qp_all = _quantize_stacked({"w": jnp.asarray(w)}, score=jnp.asarray([1.0, 2.0]), threshold=8.0)
    assert "q_on" not in qp_all and "w" not in qp_all


def _inject_gamma_outliers(params, ratio, frac=0.02, seed=5):
    """Scale a random ``frac`` of LN-gamma channels in every block norm by
    ``ratio`` — the synthetic stand-in for real CLIP outlier channels
    (activation outliers in transformers are produced by LN scale
    amplification), VERDICT r2 item 6."""
    import copy

    r = np.random.default_rng(seed)
    out = copy.deepcopy(jax.tree.map(np.array, params))
    blocks = out["visual"]["blocks"]
    for nk in ("norm1", "norm2", "norm3"):
        g = blocks[nk]["g"]
        g[r.random(g.shape) < frac] *= ratio
        blocks[nk]["g"] = g
    return jax.tree.map(jnp.asarray, out)


def test_int8_outlier_threshold_and_fallback(rng):
    """Validity domain of plain int8 + the mixed-precision fallback, at
    flagship depth (24 blocks) with synthetic LN-gamma outlier channels:

    - ratio 8x @2% channels: plain int8 keeps full argmax agreement and
      Spearman > 0.99 (measured 0.9994) -> the stated validity domain;
    - ratio 32x: plain int8 is BROKEN (argmax agreement ~0.5);
    - ratio 32x + act_outlier_threshold=8 block-level fallback: fully
      restored (measured agree 1.00 / rho 1.0000 — at this synthetic
      severity every block exceeds the threshold, so the fallback
      degenerates to bf16 everywhere; real CLIP outliers concentrate in
      a few blocks, which keep int8 elsewhere).
    """
    from scipy.stats import spearmanr

    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        decoder_forward,
        init_decoder_params,
    )
    from helping_hand_for_egocentric_videos_tpu.models import obj_decoder as dec_mod
    from helping_hand_for_egocentric_videos_tpu.models.clip_text import TextConfig
    from helping_hand_for_egocentric_videos_tpu.models.lavila import (
        LavilaConfig,
        encode_image,
        init_lavila_params,
    )

    t, n_videos = 2, 12
    cfg = LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=56, patch_size=14, width=128, depth=24, heads=4, num_frames=t
        ),
        text=TextConfig(width=64, heads=4, layers=2, embed_dim=64),
        embed_dim=64,
    )
    dcfg = DecoderConfig(
        d_model=64, nhead=4, num_layers=2, dim_feedforward=128, dropout=0.0,
        num_queries=5, feature_dim=128, text_width=64, embed_dim=64,
        num_frames=t, patches_per_frame=cfg.visual.patches_per_frame,
        pred_traj=False,
    )
    params = init_lavila_params(jax.random.PRNGKey(3), cfg)
    dec = init_decoder_params(jax.random.PRNGKey(4), dcfg)
    video = jnp.asarray(rng.normal(size=(n_videos, t, 56, 56, 3)).astype(np.float32))
    texts = jnp.asarray(rng.normal(size=(12, 64)).astype(np.float32))
    text_embed = dec_mod.txt_proj(dec, texts)

    @jax.jit
    def embed(p):
        _, fmap = encode_image(p, cfg, video, use_remat=False, dtype=jnp.float32)
        grid = fmap[:, 1:, :].reshape(n_videos, t, -1, 128)
        out = decoder_forward(dec, dcfg, grid)
        return dec_mod.obj_proj(dec, out.hs[-1])[:, -1]

    def sims(p):
        v = embed(p)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        q = text_embed / jnp.linalg.norm(text_embed, axis=-1, keepdims=True)
        return np.asarray(q @ v.T)

    def stability(p_ref, p_quant):
        s_f, s_q = sims(p_ref), sims(p_quant)
        agree = float((s_f.argmax(1) == s_q.argmax(1)).mean())
        rho = float(spearmanr(s_f.ravel(), s_q.ravel()).statistic)
        return agree, rho

    # inside the validity domain
    p8 = _inject_gamma_outliers(params, 8.0)
    agree, rho = stability(p8, quantize_lavila_params(p8))
    assert agree == 1.0 and rho > 0.99, (agree, rho)

    # beyond it: plain int8 breaks...
    p32 = _inject_gamma_outliers(params, 32.0)
    agree_plain, rho_plain = stability(p32, quantize_lavila_params(p32))
    assert rho_plain < 0.98, (agree_plain, rho_plain)

    # ...and the block-level fallback restores rank stability
    q_fb = quantize_lavila_params(p32, act_outlier_threshold=8.0)
    agree_fb, rho_fb = stability(p32, q_fb)
    assert agree_fb >= 0.95 and rho_fb > 0.995, (agree_fb, rho_fb)


def test_int8_retrieval_rank_stability(rng):
    """Rank-order stability of retrieval similarities, f32 vs int8-quantized
    visual tower, through the full eval embed path (backbone -> decoder ->
    obj_proj summary query) at flagship depth (24 blocks, narrow width so
    quantization error accumulates realistically; VERDICT r1 item 4).

    Random-weight caveat: real CLIP-derived weights have outlier channels
    that random init cannot reproduce; final validation re-runs this check
    on converted released weights via cli/test_egomcq --int8 and compares
    the dumped similarity matrices (see BENCH_NOTES.md 'Int8 eval mode').
    """
    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        decoder_forward,
        init_decoder_params,
    )
    from helping_hand_for_egocentric_videos_tpu.models import obj_decoder as dec_mod
    from helping_hand_for_egocentric_videos_tpu.models.lavila import (
        LavilaConfig,
        encode_image,
        init_lavila_params,
    )
    from helping_hand_for_egocentric_videos_tpu.models.clip_text import TextConfig

    t, n_videos, n_texts = 2, 12, 12
    cfg = LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=56, patch_size=14, width=128, depth=24, heads=4, num_frames=t
        ),
        text=TextConfig(width=64, heads=4, layers=2, embed_dim=64),
        embed_dim=64,
    )
    dcfg = DecoderConfig(
        d_model=64, nhead=4, num_layers=2, dim_feedforward=128, dropout=0.0,
        num_queries=5, feature_dim=128, text_width=64, embed_dim=64,
        num_frames=t, patches_per_frame=cfg.visual.patches_per_frame,
        pred_traj=False,
    )
    params = init_lavila_params(jax.random.PRNGKey(3), cfg)
    dec = init_decoder_params(jax.random.PRNGKey(4), dcfg)
    qparams = quantize_lavila_params(params)

    video = jnp.asarray(
        rng.normal(size=(n_videos, t, 56, 56, 3)).astype(np.float32)
    )
    texts = jnp.asarray(rng.normal(size=(n_texts, 64)).astype(np.float32))
    text_embed = dec_mod.txt_proj(dec, texts)

    def embed(p):
        _, fmap = encode_image(p, cfg, video, use_remat=False, dtype=jnp.float32)
        grid = fmap[:, 1:, :].reshape(n_videos, t, -1, 128)
        out = decoder_forward(dec, dcfg, grid)
        return dec_mod.obj_proj(dec, out.hs[-1])[:, -1]

    def sims(p):
        v = embed(p)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        q = text_embed / jnp.linalg.norm(text_embed, axis=-1, keepdims=True)
        return np.asarray(q @ v.T)

    s_f32 = sims(params)
    s_int8 = sims(qparams)

    # EgoMCQ-style decision stability: per-text argmax over candidates
    assert (s_f32.argmax(1) == s_int8.argmax(1)).mean() >= 0.9

    # global rank-order stability (Spearman over all pairs)
    from scipy.stats import spearmanr

    rho = spearmanr(s_f32.ravel(), s_int8.ravel()).statistic
    assert rho > 0.99, rho


def test_bf16_eval_rank_stability(rng):
    """The eval path runs the frozen tower in bf16 (the train/eval default);
    retrieval rank order must be stable vs the f32 reference at flagship
    depth — the random-weight proxy for the real-weight bf16-vs-f32
    ablation (TODO.md)."""
    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        decoder_forward,
        init_decoder_params,
    )
    from helping_hand_for_egocentric_videos_tpu.models import obj_decoder as dec_mod
    from helping_hand_for_egocentric_videos_tpu.models.clip_text import TextConfig
    from helping_hand_for_egocentric_videos_tpu.models.lavila import (
        LavilaConfig,
        encode_image,
        init_lavila_params,
    )

    t, n_videos = 2, 12
    cfg = LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=56, patch_size=14, width=128, depth=24, heads=4, num_frames=t
        ),
        text=TextConfig(width=64, heads=4, layers=2, embed_dim=64),
        embed_dim=64,
    )
    dcfg = DecoderConfig(
        d_model=64, nhead=4, num_layers=2, dim_feedforward=128, dropout=0.0,
        num_queries=5, feature_dim=128, text_width=64, embed_dim=64,
        num_frames=t, patches_per_frame=cfg.visual.patches_per_frame,
        pred_traj=False,
    )
    params = init_lavila_params(jax.random.PRNGKey(7), cfg)
    dec = init_decoder_params(jax.random.PRNGKey(8), dcfg)
    video = jnp.asarray(rng.normal(size=(n_videos, t, 56, 56, 3)).astype(np.float32))
    texts = jnp.asarray(rng.normal(size=(n_videos, 64)).astype(np.float32))
    text_embed = dec_mod.txt_proj(dec, texts)

    def sims(dtype):
        _, fmap = encode_image(params, cfg, video, use_remat=False, dtype=dtype)
        grid = fmap[:, 1:, :].reshape(n_videos, t, -1, 128)
        out = decoder_forward(dec, dcfg, grid)
        v = dec_mod.obj_proj(dec, out.hs[-1])[:, -1]
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        q = text_embed / jnp.linalg.norm(text_embed, axis=-1, keepdims=True)
        return np.asarray(q @ v.T)

    s32 = sims(jnp.float32)
    s16 = sims(jnp.bfloat16)
    assert (s32.argmax(1) == s16.argmax(1)).mean() >= 0.9

    from scipy.stats import spearmanr

    rho = spearmanr(s32.ravel(), s16.ravel()).statistic
    assert rho > 0.99, rho
