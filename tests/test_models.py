"""Model semantics tests on tiny configs.

Oracles are independent: torch.nn.functional ops (conv2d, MHA) configured
from first principles — no reference code. Key invariants verified:
  - patchify == stride-P conv2d
  - our MHA == torch.nn.MultiheadAttention
  - zero-initialised time attention => backbone CLS is frame-permutation
    invariant (the TimeSformer 'starts as ViT' property, LaviLa time_init
    ='zeros')
  - causal text tower: future tokens don't affect past positions; EOT
    lookup picks the max token id position
  - decoder output shapes for trajectory/aux modes
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from helping_hand_for_egocentric_videos_tpu.models import (
    DecoderConfig,
    SpaceTimeConfig,
    TextConfig,
    decoder_forward,
    encode_text,
    init_decoder_params,
    init_spacetime_params,
    init_text_params,
    spacetime_forward,
)
from helping_hand_for_egocentric_videos_tpu.models.layers import (
    multi_head_attention,
    quick_gelu,
)
from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import patchify

KEY = jax.random.PRNGKey(0)

TINY_VIT = SpaceTimeConfig(
    img_size=32, patch_size=16, width=64, depth=2, heads=4, num_frames=2
)
TINY_TXT = TextConfig(
    vocab_size=100, context_length=16, width=32, heads=4, layers=2, embed_dim=8
)


def test_quick_gelu():
    x = np.linspace(-3, 3, 7, dtype=np.float32)
    got = np.asarray(quick_gelu(jnp.asarray(x)))
    want = x * (1 / (1 + np.exp(-1.702 * x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_patchify_matches_conv2d(rng):
    cfg = TINY_VIT
    params = init_spacetime_params(KEY, cfg)
    video = rng.normal(size=(2, 2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(patchify(params, cfg, jnp.asarray(video)))

    # torch oracle: conv2d stride=P, weight (D, C, P, P) from our (P*P*C, D)
    w = np.asarray(params["patch_embed"]["w"])  # (P*P*C, D)
    w_t = w.reshape(16, 16, 3, 64).transpose(3, 2, 0, 1)  # (D, C, kh, kw)
    x_t = torch.tensor(video.reshape(4, 32, 32, 3).transpose(0, 3, 1, 2))
    out = torch.nn.functional.conv2d(x_t, torch.tensor(w_t), stride=16)
    out = out.flatten(2).transpose(2, 1).reshape(2, 2 * 4, 64).numpy()
    np.testing.assert_allclose(got, out, atol=1e-4)


def test_mha_matches_torch(rng):
    d, h, b, nq, nk = 32, 4, 2, 5, 7
    from helping_hand_for_egocentric_videos_tpu.models.layers import mha_init

    p = mha_init(jax.random.PRNGKey(1), d)
    q = rng.normal(size=(b, nq, d)).astype(np.float32)
    k = rng.normal(size=(b, nk, d)).astype(np.float32)
    v = rng.normal(size=(b, nk, d)).astype(np.float32)
    got = np.asarray(multi_head_attention(p, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h))

    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    with torch.no_grad():
        in_proj_w = np.concatenate(
            [np.asarray(p[w]["w"]).T for w in ("wq", "wk", "wv")], axis=0
        )
        in_proj_b = np.concatenate([np.asarray(p[w]["b"]) for w in ("wq", "wk", "wv")])
        mha.in_proj_weight.copy_(torch.tensor(in_proj_w))
        mha.in_proj_bias.copy_(torch.tensor(in_proj_b))
        mha.out_proj.weight.copy_(torch.tensor(np.asarray(p["wo"]["w"]).T))
        mha.out_proj.bias.copy_(torch.tensor(np.asarray(p["wo"]["b"])))
        want = mha(torch.tensor(q), torch.tensor(k), torch.tensor(v))[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_backbone_shapes_and_frame_invariance_at_init(rng):
    cfg = TINY_VIT
    params = init_spacetime_params(KEY, cfg)
    video = rng.normal(size=(2, 2, 32, 32, 3)).astype(np.float32)
    cls, tokens = spacetime_forward(
        params, cfg, jnp.asarray(video), use_remat=False, dtype=jnp.float32
    )
    n = cfg.patches_per_frame
    assert cls.shape == (2, 64)
    assert tokens.shape == (2, 1 + 2 * n, 64)

    # zero-init time attention + zero temporal embed: swapping frames must
    # permute patch tokens and leave CLS unchanged (ViT-equivalence at init)
    video_swapped = video[:, ::-1].copy()
    cls2, tokens2 = spacetime_forward(
        params, cfg, jnp.asarray(video_swapped), use_remat=False, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(cls), np.asarray(cls2), atol=1e-4)
    t1 = np.asarray(tokens)[:, 1:].reshape(2, 2, n, 64)
    t2 = np.asarray(tokens2)[:, 1:].reshape(2, 2, n, 64)
    np.testing.assert_allclose(t1, t2[:, ::-1], atol=1e-4)


def test_backbone_remat_matches_no_remat(rng):
    cfg = TINY_VIT
    params = init_spacetime_params(jax.random.PRNGKey(3), cfg)
    video = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3)).astype(np.float32))
    a = spacetime_forward(params, cfg, video, use_remat=False, dtype=jnp.float32)[1]
    b = spacetime_forward(params, cfg, video, use_remat=True, dtype=jnp.float32)[1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_text_tower_causal_and_eot(rng):
    cfg = TINY_TXT
    params = init_text_params(jax.random.PRNGKey(2), cfg)
    tokens = np.zeros((2, 16), dtype=np.int32)
    tokens[0, :5] = [98, 5, 7, 3, 99]  # SOT ... EOT at position 4
    tokens[1, :3] = [98, 4, 99]
    x_cls, fmap = encode_text(params, cfg, jnp.asarray(tokens))
    assert x_cls.shape == (2, 8) and fmap.shape == (2, 16, 32)

    # causality: changing a future token must not change earlier positions
    tokens2 = tokens.copy()
    tokens2[0, 10] = 55
    _, fmap2 = encode_text(params, cfg, jnp.asarray(tokens2))
    np.testing.assert_allclose(
        np.asarray(fmap[0, :10]), np.asarray(fmap2[0, :10]), atol=1e-5
    )
    assert not np.allclose(np.asarray(fmap[0, 10]), np.asarray(fmap2[0, 10]))

    # EOT lookup = argmax(token ids): row1 EOT at position 2
    eot_manual = np.asarray(fmap)[1, 2] @ np.asarray(params["text_projection"])
    np.testing.assert_allclose(np.asarray(x_cls)[1], eot_manual, atol=1e-5)


def test_decoder_shapes_traj_mode(rng):
    cfg = DecoderConfig(
        d_model=32,
        nhead=4,
        num_layers=3,
        dim_feedforward=64,
        num_queries=5,
        num_classes=10,
        feature_dim=48,
        text_width=24,
        embed_dim=8,
        num_frames=2,
        patches_per_frame=4,
    )
    params = init_decoder_params(jax.random.PRNGKey(4), cfg)
    feats = jnp.asarray(rng.normal(size=(2, 2, 4, 48)).astype(np.float32))
    out = decoder_forward(params, cfg, feats)
    # traj mode: boxes per frame -> B*T rows
    assert out.pred_boxes.shape == (4, 5, 4)
    assert out.pred_logits.shape == (4, 5, 11)
    assert out.aux_pred_boxes.shape == (2, 4, 5, 4)
    assert out.hs.shape == (3, 2, 5, 32)
    b = np.asarray(out.pred_boxes)
    assert (b >= 0).all() and (b <= 1).all()  # sigmoid cxcywh


def test_decoder_no_traj_mode(rng):
    # pred_traj=False (the Epic 16-frame eval configuration,
    # run/test_epic.py:145-182): boxes are per-clip, not per-frame.
    cfg = DecoderConfig(
        d_model=32,
        nhead=4,
        num_layers=2,
        dim_feedforward=64,
        num_queries=5,
        num_classes=10,
        feature_dim=48,
        num_frames=4,
        patches_per_frame=4,
        pred_traj=False,
    )
    params = init_decoder_params(jax.random.PRNGKey(5), cfg)
    feats = jnp.asarray(rng.normal(size=(1, 4, 4, 48)).astype(np.float32))
    out = decoder_forward(params, cfg, feats)
    assert out.pred_boxes.shape == (1, 5, 4)  # per-clip boxes
    # T shorter than the temporal table also works (variable-length clips)
    feats2 = jnp.asarray(rng.normal(size=(1, 2, 4, 48)).astype(np.float32))
    out2 = decoder_forward(params, cfg, feats2)
    assert out2.pred_boxes.shape == (1, 5, 4)


def test_decoder_single_query_mode(rng):
    cfg = DecoderConfig(
        d_model=32,
        nhead=4,
        num_layers=2,
        dim_feedforward=64,
        num_queries=1,
        num_classes=10,
        feature_dim=48,
        num_frames=2,
        patches_per_frame=4,
        n_decode=6,
    )
    params = init_decoder_params(jax.random.PRNGKey(6), cfg)
    feats = jnp.asarray(rng.normal(size=(2, 2, 4, 48)).astype(np.float32))
    out = decoder_forward(params, cfg, feats)
    assert out.pred_boxes.shape == (4, 6, 4)  # B*T rows, n_decode boxes


def test_decoder_dropout_determinism(rng):
    cfg = DecoderConfig(
        d_model=32, nhead=4, num_layers=2, dim_feedforward=64, num_queries=3,
        num_classes=4, feature_dim=48, num_frames=2, patches_per_frame=4,
    )
    params = init_decoder_params(jax.random.PRNGKey(7), cfg)
    feats = jnp.asarray(rng.normal(size=(1, 2, 4, 48)).astype(np.float32))
    a = decoder_forward(params, cfg, feats, deterministic=True)
    b = decoder_forward(params, cfg, feats, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a.pred_boxes), np.asarray(b.pred_boxes))
    c = decoder_forward(
        params, cfg, feats, rng=jax.random.PRNGKey(0), deterministic=False
    )
    assert not np.allclose(np.asarray(a.pred_boxes), np.asarray(c.pred_boxes))


def test_mha_attention_prob_dropout(rng):
    """torch nn.MultiheadAttention(dropout=p) drops the softmax weights;
    the dropout_rng/dropout_rate args reproduce that site (active only
    with a rng; return_probs reports pre-dropout weights like torch)."""
    from helping_hand_for_egocentric_videos_tpu.models.layers import (
        mha_init,
        multi_head_attention,
    )

    p = mha_init(jax.random.PRNGKey(0), 32)
    x = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    base = multi_head_attention(p, x, x, x, 4)
    same = multi_head_attention(p, x, x, x, 4, dropout_rng=jax.random.PRNGKey(1), dropout_rate=0.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    dropped = multi_head_attention(p, x, x, x, 4, dropout_rng=jax.random.PRNGKey(1), dropout_rate=0.5)
    assert not np.allclose(np.asarray(base), np.asarray(dropped))
    _, probs = multi_head_attention(
        p, x, x, x, 4, return_probs=True,
        dropout_rng=jax.random.PRNGKey(1), dropout_rate=0.5,
    )
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0, atol=1e-5)


def test_text_init_independent_qkv_and_out_proj_std():
    """CLIP initialize_parameters draws ONE (3D, D) in_proj (independent
    q/k/v slices) and out_proj ~ N(0, proj_std); a shared key once made
    Wq == Wk == Wv bit-identical and left wo at the generic init."""
    from helping_hand_for_egocentric_videos_tpu.models.clip_text import (
        TextConfig,
        init_text_params,
    )

    cfg = TextConfig(vocab_size=64, context_length=12, width=256, heads=4, layers=3, embed_dim=16)
    p = init_text_params(jax.random.PRNGKey(0), cfg)
    wq = np.asarray(p["blocks"]["attn"]["wq"]["w"][0])
    wk = np.asarray(p["blocks"]["attn"]["wk"]["w"][0])
    wv = np.asarray(p["blocks"]["attn"]["wv"]["w"][0])
    assert not np.array_equal(wq, wk) and not np.array_equal(wk, wv)
    proj_std = (cfg.width**-0.5) * ((2 * cfg.layers) ** -0.5)
    wo_std = float(np.asarray(p["blocks"]["attn"]["wo"]["w"]).std())
    assert abs(wo_std - proj_std) / proj_std < 0.1
    attn_std = cfg.width**-0.5
    assert abs(float(wq.std()) - attn_std) / attn_std < 0.1


def test_decoder_init_packed_xavier_bound():
    """torch xavier-uniforms the PACKED (3d, d) in_proj: per-matrix q/k/v
    draws must use the packed fans (bound sqrt(6/4d), not sqrt(6/2d))."""
    cfg = DecoderConfig(
        d_model=64, nhead=4, num_layers=2, dim_feedforward=128, num_queries=3,
        num_classes=4, feature_dim=48, num_frames=2, patches_per_frame=4,
    )
    p = init_decoder_params(jax.random.PRNGKey(3), cfg)
    d = cfg.d_model
    packed_bound = (6.0 / (4 * d)) ** 0.5
    for attn in ("self_attn", "cross_attn"):
        for w in ("wq", "wk", "wv"):
            arr = np.asarray(p["layers"][attn][w]["w"])
            assert np.abs(arr).max() <= packed_bound + 1e-6, (attn, w)
            # and it actually fills the packed range (not the out-proj's)
            assert np.abs(arr).max() > 0.9 * packed_bound


def test_decoder_attention_maps(rng):
    cfg = DecoderConfig(
        d_model=32, nhead=4, num_layers=2, dim_feedforward=64, num_queries=5,
        num_classes=4, feature_dim=48, num_frames=2, patches_per_frame=4,
    )
    params = init_decoder_params(jax.random.PRNGKey(9), cfg)
    feats = jnp.asarray(rng.normal(size=(2, 2, 4, 48)).astype(np.float32))
    out = decoder_forward(params, cfg, feats, return_attn=True)
    assert out.cross_attn.shape == (2, 2, 5, 8)  # (L, B, Q, T*N)
    assert out.self_attn.shape == (2, 2, 5, 5)
    # rows are probability distributions
    np.testing.assert_allclose(np.asarray(out.cross_attn).sum(-1), 1.0, atol=1e-5)
    # boxes identical with/without attn collection
    base = decoder_forward(params, cfg, feats)
    np.testing.assert_allclose(
        np.asarray(out.pred_boxes), np.asarray(base.pred_boxes), atol=1e-6
    )


def test_backbone_pallas_interpret_matches_xla(rng):
    """CPU-runnable parity for the rows kernel (interpret mode) vs the
    grouped-einsum XLA path, covering the spatial kernel, the temporal
    periodic block-diagonal mask (nb > 1), and the CLS-row streaming
    partials through a full 2-block backbone."""
    from dataclasses import replace

    cfg_pl = SpaceTimeConfig(
        img_size=112, patch_size=14, width=128, depth=2, heads=2, num_frames=2,
        attention_backend="pallas_interpret",
    )
    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        _temporal_block,
    )

    assert _temporal_block(2, cfg_pl.patches_per_frame) > 1  # mask path on
    cfg_xla = replace(cfg_pl, attention_backend="xla")
    params = init_spacetime_params(jax.random.PRNGKey(0), cfg_pl)
    video = jnp.asarray(rng.normal(size=(2, 2, 112, 112, 3)).astype(np.float32))
    a_cls, a = spacetime_forward(params, cfg_xla, video, use_remat=False, dtype=jnp.float32)
    b_cls, b = spacetime_forward(params, cfg_pl, video, use_remat=False, dtype=jnp.float32)
    # on a TPU backend, interpret mode executes the kernel's pinned
    # precision=DEFAULT dots on the MXU (bf16 passes) while the XLA path
    # runs under conftest's 'highest' override — tolerance must widen
    atol = 2e-5 if jax.default_backend() == "cpu" else 3e-2
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)
    np.testing.assert_allclose(np.asarray(a_cls), np.asarray(b_cls), atol=atol)


def test_rows_kernel_quant_out_interpret(rng):
    """quant_out path (int8 eval): the kernel's in-VMEM per-token output
    quantization must match quantizing the normal kernel output in XLA —
    same scale rule as quant.int8_linear — and the int8-proj model path
    (_var_attention_split with a quantized proj) must agree with
    quantize-after-attention to one quantization step."""
    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        divided_patch_attention,
    )

    b, t, n, d, heads = 2, 2, 16, 128, 2
    qkv = jnp.asarray(rng.normal(size=(b, t, n, 3 * d)).astype(np.float32) * 0.3)
    ck = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)
    cv = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)
    cq = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)

    for mode in ("space", "time"):
        ref = divided_patch_attention(
            qkv, ck, cv, cq, mode=mode, heads=heads, interpret=True
        )[0]
        (out_q, s_x), _ = divided_patch_attention(
            qkv, ck, cv, cq, mode=mode, heads=heads, interpret=True, quant_out=True
        )
        assert out_q.dtype == jnp.int8 and s_x.shape == (b, t, n, 1)
        # same scale rule as int8_linear (abs-max / 127, floored)
        want_s = np.maximum(
            np.max(np.abs(np.asarray(ref)), axis=-1, keepdims=True) / 127.0, 1e-8
        )
        np.testing.assert_allclose(np.asarray(s_x), want_s, rtol=1e-5, err_msg=mode)
        deq = np.asarray(out_q, np.float32) * np.asarray(s_x)
        np.testing.assert_allclose(
            deq, np.asarray(ref), atol=1.01 * want_s.max(), err_msg=mode
        )


def test_var_attention_int8_proj_interpret(rng):
    """The int8-proj wiring in _var_attention_split: kernel quant_out +
    int8_linear_prequant vs the XLA attention followed by the standard
    dynamic int8_linear — identical int8 weight path, so outputs agree to
    quantization noise."""
    from helping_hand_for_egocentric_videos_tpu.models.quant import (
        _quantize_stacked,
    )
    from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import (
        _init_attn,
        _var_attention,
        _var_attention_split,
    )

    t, n, width, heads = 2, 16, 128, 2
    p = _init_attn(jax.random.PRNGKey(0), width, zero_init=False)
    # quantize qkv+proj the same way quantize_lavila_params does, then
    # slice the stacked (L=1) leaves back to per-layer shapes
    pq = dict(p)
    for subkey in ("qkv", "proj"):
        stacked = {k: v[None] for k, v in p[subkey].items()}
        qd = _quantize_stacked(stacked)
        pq[subkey] = {k: v[0] for k, v in qd.items()}
    x = jnp.asarray(rng.normal(size=(2, 1 + t * n, width)).astype(np.float32))

    for mode in ("time", "space"):
        want = _var_attention(pq, x, t, n, heads, mode)  # XLA + int8_linear
        got_c, got_p = _var_attention_split(
            pq, x[:, :1], x[:, 1:], t, n, heads, mode, "pallas_interpret"
        )
        scale = float(np.abs(np.asarray(want)).max())
        np.testing.assert_allclose(
            np.asarray(got_p), np.asarray(want[:, 1:]), atol=0.05 * scale,
            err_msg=mode,
        )
        np.testing.assert_allclose(
            np.asarray(got_c), np.asarray(want[:, :1]), atol=0.05 * scale,
            err_msg=mode,
        )


def test_backbone_int8_kernels_interpret(rng):
    """Full int8 backbone: the interpret-mode pallas path (ln_int8 +
    quant_out attention + gelu_int8 + prequant matmuls) vs the XLA path
    with dynamic int8_linear at every matmul — same weights, outputs agree
    to quantization noise."""
    from dataclasses import replace

    from helping_hand_for_egocentric_videos_tpu.models.quant import (
        quantize_lavila_params,
    )

    cfg_pl = SpaceTimeConfig(
        img_size=112, patch_size=14, width=128, depth=2, heads=2, num_frames=2,
        attention_backend="pallas_interpret",
    )
    cfg_xla = replace(cfg_pl, attention_backend="xla")
    params = init_spacetime_params(jax.random.PRNGKey(0), cfg_pl)
    qparams = quantize_lavila_params({"visual": params})["visual"]
    video = jnp.asarray(rng.normal(size=(1, 2, 112, 112, 3)).astype(np.float32))
    a_cls, a = spacetime_forward(qparams, cfg_xla, video, use_remat=False, dtype=jnp.float32)
    b_cls, b = spacetime_forward(qparams, cfg_pl, video, use_remat=False, dtype=jnp.float32)
    scale = float(np.abs(np.asarray(a)).max())
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0.06 * scale)
    np.testing.assert_allclose(np.asarray(b_cls), np.asarray(a_cls), atol=0.06 * scale)


def test_act_quant_kernels_interpret(rng):
    """layer_norm_int8 / quick_gelu_int8 vs [reference op -> int8_linear's
    scale rule], incl. a row count that needs padding."""
    from helping_hand_for_egocentric_videos_tpu.models.layers import (
        layer_norm,
        quick_gelu,
    )
    from helping_hand_for_egocentric_videos_tpu.ops.act_quant import (
        layer_norm_int8,
        quick_gelu_int8,
    )

    for m, d in ((7, 128), (300, 256)):
        x = jnp.asarray(rng.normal(size=(2, m, d)).astype(np.float32))
        p = {
            "g": jnp.asarray(1.0 + 0.2 * rng.normal(size=(d,)).astype(np.float32)),
            "b": jnp.asarray(0.1 * rng.normal(size=(d,)).astype(np.float32)),
        }
        q, s = layer_norm_int8(p, x, 1e-6, interpret=True)
        assert q.dtype == jnp.int8 and s.shape == (2, m, 1)
        want = np.asarray(layer_norm(p, x, 1e-6))
        want_s = np.maximum(np.max(np.abs(want), -1, keepdims=True) / 127.0, 1e-8)
        np.testing.assert_allclose(np.asarray(s), want_s, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(q, np.float32) * np.asarray(s), want, atol=1.01 * want_s.max()
        )

        qg, sg = quick_gelu_int8(x, interpret=True)
        wg = np.asarray(quick_gelu(x))
        wgs = np.maximum(np.max(np.abs(wg), -1, keepdims=True) / 127.0, 1e-8)
        np.testing.assert_allclose(np.asarray(sg), wgs, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(qg, np.float32) * np.asarray(sg), wg, atol=1.01 * wgs.max()
        )


def test_temporal_block_sizes_bounded():
    """Long clips fall to the minimum 8-patch tile instead of degenerating
    to the whole patch axis (VMEM blowup at R = t*n)."""
    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        _temporal_block,
    )

    assert _temporal_block(16, 256) == 16  # R = 256 sweet spot
    assert _temporal_block(4, 256) == 64
    assert _temporal_block(48, 256) == 8  # R = 384, not 12288
    assert _temporal_block(64, 256) == 8
    assert _temporal_block(2, 64) == 64  # capped by n
    for t in (2, 4, 12, 16, 48, 100):
        nb = _temporal_block(t, 256)
        assert 256 % nb == 0 and (nb % 8 == 0 or nb == 256)
        assert t * nb <= 1024


def test_kernel_friendly_time_mode_long_clips():
    """Long temporal tiles (R = t*nb > 256) stay in Pallas through t = 64:
    the kernel raises its per-call vmem_limit_bytes for R > 256 tiles
    (the per-head logits/exp stack buffers are not reused across the
    unrolled head loop, so the default 16 MiB limit rejects t=64/R=512 at
    a 33.65 MiB ask — BENCH_NOTES r5). Asks past _VMEM_LIMIT (t=128 on
    flagship heads needs ~134 MiB > physical VMEM) fall back to XLA for
    mode='time' only; spatial tiles are per-frame and T-independent."""
    from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import (
        _kernel_friendly,
    )
    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        _VMEM_LIMIT,
        _scoped_vmem_ask,
    )

    # flagship shapes: N=256 patches, D=1024, 16 heads
    for t in (4, 16, 32, 48, 64):
        assert _kernel_friendly(256, 1024, 16, t, "time")
        assert _kernel_friendly(256, 1024, 16, t, "space")
    assert not _kernel_friendly(256, 1024, 16, 128, "time")  # ~134 MiB ask
    assert _kernel_friendly(256, 1024, 16, 128, "space")  # unaffected
    # default mode is spatial (back-compat with existing callers)
    assert _kernel_friendly(256, 1024, 16, 64)
    # the ask estimate reproduces the measured 33.65 MiB rejection at
    # R=512 and stays under the raised per-kernel limit
    ask = _scoped_vmem_ask(512, 16)
    assert 32 * 2**20 < ask < 36 * 2**20
    assert ask + 16 * 2**20 <= _VMEM_LIMIT
    assert _scoped_vmem_ask(1024, 16) + 16 * 2**20 > _VMEM_LIMIT


@pytest.mark.parametrize(
    "t,n_side,width,heads",
    [
        (2, 8, 128, 2),   # nb = n (single tile)
        (3, 8, 128, 2),   # odd t
        (4, 6, 256, 4),   # n=36 -> nb search hits n%nb constraints
        (5, 8, 192, 3),   # heads=3, dh=64, odd t
        (48, 4, 128, 2),  # long clip: nb falls to the minimum 8-patch tile
        # R = t*nb = 288 > 256: the raised-vmem_limit_bytes long-tile
        # path (same kernel body; exercises the CompilerParams plumbing
        # end-to-end in interpret mode at the smallest long-tile shape)
        (36, 3, 128, 2),
    ],
)
def test_rows_kernel_interpret_shape_fuzz(rng, t, n_side, width, heads):
    """Interpret-mode rows kernel vs the XLA divided attention across odd
    shapes: non-16 head counts, odd frame counts, non-power-of-two patch
    grids (R/nb edge cases of _temporal_block)."""
    from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import (
        _var_attention,
        _var_attention_split,
    )
    from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import _init_attn

    n = n_side * n_side
    p = _init_attn(jax.random.PRNGKey(0), width, zero_init=False)
    x = jnp.asarray(rng.normal(size=(2, 1 + t * n, width)).astype(np.float32))

    # see test_backbone_pallas_interpret_matches_xla for the TPU tolerance
    atol = 2e-5 if jax.default_backend() == "cpu" else 3e-2
    for mode in ("time", "space"):
        want = _var_attention(p, x, t, n, heads, mode)
        got_c, got_p = _var_attention_split(
            p, x[:, :1], x[:, 1:], t, n, heads, mode, "pallas_interpret"
        )
        np.testing.assert_allclose(
            np.asarray(got_c), np.asarray(want[:, :1]), atol=atol, err_msg=mode
        )
        np.testing.assert_allclose(
            np.asarray(got_p), np.asarray(want[:, 1:]), atol=atol, err_msg=mode
        )


# ------------------------------------------- random-init image towers
def test_clip_vit_random_init_forward():
    """init_clip_vit_params must produce a tree clip_vit_encode can run
    (shape contract of openai_model.py:206-273); loading-based tests cover
    converted weights, this covers from-scratch init."""
    import jax

    from helping_hand_for_egocentric_videos_tpu.models import (
        ClipVitConfig,
        clip_vit_encode,
        init_clip_vit_params,
    )

    cfg = ClipVitConfig(
        input_resolution=32, patch_size=16, width=64, layers=2, heads=2, output_dim=16
    )
    assert cfg.grid == 2
    params = init_clip_vit_params(jax.random.PRNGKey(0), cfg)
    imgs = np.linspace(0, 1, 2 * 32 * 32 * 3, dtype=np.float32).reshape(2, 32, 32, 3)
    out = clip_vit_encode(params, cfg, imgs)
    assert out.shape == (2, 16) and np.isfinite(np.asarray(out)).all()
    unproj = clip_vit_encode(params, cfg, imgs, apply_project=False)
    assert unproj.shape == (2, 64)
    fmap = clip_vit_encode(params, cfg, imgs, cls_at_last=False)
    assert fmap.shape == (2, 4, 64)


def test_clip_resnet_random_init_forward():
    """init_clip_resnet_params -> clip_resnet_encode from scratch: stem,
    4 stages with stride-2 anti-aliased bottlenecks, attention pool."""
    import jax

    from helping_hand_for_egocentric_videos_tpu.models import (
        ClipResNetConfig,
        clip_resnet_encode,
        init_clip_resnet_params,
    )

    cfg = ClipResNetConfig(
        layers=(1, 1, 1, 1), output_dim=24, heads=4, input_resolution=64, width=16
    )
    params = init_clip_resnet_params(jax.random.PRNGKey(1), cfg)
    # every stage after the first downsamples once
    assert "downsample" in params["layer2"][0]
    assert params["layer2"][0]["stride"] == 2 and params["layer1"][0]["stride"] == 1
    imgs = np.linspace(0, 1, 2 * 64 * 64 * 3, dtype=np.float32).reshape(2, 64, 64, 3)
    out = clip_resnet_encode(params, cfg, imgs)
    assert out.shape == (2, 24) and np.isfinite(np.asarray(out)).all()


def test_flagship_config_constants_match_reference():
    """Pin the released-architecture constants: TimeSformer-L (img 224,
    patch 14, width 1024, depth 24, heads 16 — model/LaviLa.py:118-121)
    with a 12x768 text tower and 256-d projections (LaviLa.py:151-160);
    base = patch 16 / width 768 / depth 12 (LaviLa.py:55-111)."""
    from helping_hand_for_egocentric_videos_tpu.models import (
        timesformer_base_config,
        timesformer_large_config,
    )

    big = timesformer_large_config(num_frames=4)
    v = big.visual
    assert (v.img_size, v.patch_size, v.width, v.depth, v.heads, v.num_frames) == (
        224, 14, 1024, 24, 16, 4,
    )
    assert (big.text.width, big.text.heads, big.text.layers) == (768, 12, 12)
    assert big.embed_dim == 256 and big.text.embed_dim == 256

    base = timesformer_base_config(num_frames=4)
    v = base.visual
    assert (v.img_size, v.patch_size, v.width, v.depth, v.heads) == (224, 16, 768, 12, 12)
    assert (base.text.width, base.text.heads, base.text.layers) == (512, 8, 12)


def test_clip_preprocess_shapes_and_normalisation():
    """zoo.clip_preprocess = the reference CLIP eval transform
    (openai_clip.py:89-96): shorter-side bicubic resize, center crop,
    CLIP channel normalisation. A constant image is invariant under
    resize, so the normalised value is exact."""
    from helping_hand_for_egocentric_videos_tpu.models.zoo import (
        CLIP_MEAN,
        CLIP_STD,
        clip_preprocess,
    )

    imgs = np.full((2, 48, 80, 3), 128, np.uint8)
    out = np.asarray(clip_preprocess(imgs, n_px=16))
    assert out.shape == (2, 16, 16, 3)
    want = (128 / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out, np.broadcast_to(want, out.shape), rtol=0, atol=1e-5)


def test_public_exports_resolve():
    """Every __all__ name on every import surface resolves (guards the
    re-export shims and docs/API.md against rot)."""
    import importlib

    for mod in (
        "ops", "models", "losses", "metrics", "data", "parallel", "train",
        "serve", "core.config", "core.checkpoint", "models.weights",
        "models.quant", "data.samplers",
    ):
        m = importlib.import_module(f"helping_hand_for_egocentric_videos_tpu.{mod}")
        exported = getattr(m, "__all__", [])
        assert exported, f"{mod} exports nothing"
        for name in exported:
            assert getattr(m, name, None) is not None, f"{mod}.{name} missing"


def test_rows_kernel_fused_den_interpret(rng):
    """fused_den A/B variant (kernel-tail experiment, BENCH_NOTES r4):
    exp fused straight into the bf16 probs and the softmax denominator
    taken from an appended ones column of the value dot. Must agree with
    the plain kernel exactly in f32 (the ones-column sum IS the sum) and
    to bf16-prob rounding noise in bf16, for both modes, with CLS
    partials and with quant_out."""
    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        divided_patch_attention,
        merge_cls_partials,
    )

    b, t, n, d, heads = 2, 2, 16, 128, 2
    qkv = jnp.asarray(rng.normal(size=(b, t, n, 3 * d)).astype(np.float32) * 0.3)
    ck = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)
    cv = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)
    cq = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)

    for mode in ("space", "time"):
        for dtype, atol in ((jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)):
            args = (qkv.astype(dtype), ck.astype(dtype), cv.astype(dtype),
                    cq.astype(dtype))
            ref, (m0, s0, co0) = divided_patch_attention(
                *args, mode=mode, heads=heads, interpret=True
            )
            out, (m1, s1, co1) = divided_patch_attention(
                *args, mode=mode, heads=heads, interpret=True, fused_den=True
            )
            np.testing.assert_allclose(
                np.asarray(out, np.float32),
                np.asarray(ref, np.float32),
                atol=atol,
                err_msg=f"{mode}/{dtype}",
            )
            # CLS partials: identical maxes; fused den/value partials only
            # differ by bf16 prob rounding
            np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(s1), np.asarray(s0), rtol=1e-2 if dtype == jnp.bfloat16 else 1e-6
            )
            cls0 = merge_cls_partials(m0, s0, co0, cq, ck, cv, heads)
            cls1 = merge_cls_partials(m1, s1, co1, cq, ck, cv, heads)
            np.testing.assert_allclose(
                np.asarray(cls1), np.asarray(cls0), atol=atol, err_msg=f"{mode}/{dtype}"
            )

        # quant_out composes with fused_den
        (q0, sx0), _ = divided_patch_attention(
            qkv, ck, cv, cq, mode=mode, heads=heads, interpret=True, quant_out=True
        )
        (q1, sx1), _ = divided_patch_attention(
            qkv, ck, cv, cq, mode=mode, heads=heads, interpret=True,
            quant_out=True, fused_den=True,
        )
        np.testing.assert_allclose(np.asarray(sx1), np.asarray(sx0), rtol=1e-5)
        assert (np.abs(np.asarray(q1, np.int32) - np.asarray(q0, np.int32)) <= 1).all()


def test_backbone_fused_den_interpret_agrees_with_xla(rng):
    """Full 2-block backbone with fused_den_attention=True (interpret
    kernels) vs the XLA einsum path."""
    from dataclasses import replace

    cfg_pl = SpaceTimeConfig(
        img_size=112, patch_size=14, width=128, depth=2, heads=2, num_frames=2,
        attention_backend="pallas_interpret", fused_den_attention=True,
    )
    cfg_xla = replace(
        cfg_pl, attention_backend="xla", fused_den_attention=False
    )
    params = init_spacetime_params(jax.random.PRNGKey(0), cfg_pl)
    video = jnp.asarray(rng.normal(size=(1, 2, 112, 112, 3)).astype(np.float32))
    a_cls, a = spacetime_forward(params, cfg_xla, video, use_remat=False, dtype=jnp.float32)
    b_cls, b = spacetime_forward(params, cfg_pl, video, use_remat=False, dtype=jnp.float32)
    atol = 2e-5 if jax.default_backend() == "cpu" else 3e-2
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)
    np.testing.assert_allclose(np.asarray(a_cls), np.asarray(b_cls), atol=atol)


def test_rows_kernel_coalesced_epilogue_interpret(rng):
    """coalesce_out A/B variant (kernel-tail experiment #2, BENCH_NOTES
    r4): identical math with the per-head output/partial stores replaced
    by one full-width store each after the head loop. Must be BIT-EXACT
    vs the plain kernel (only the store schedule changes), for both
    modes, composed with quant_out and fused_den, and through the full
    backbone via SpaceTimeConfig.coalesced_epilogue."""
    from dataclasses import replace

    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        divided_patch_attention,
    )

    b, t, n, d, heads = 2, 2, 16, 128, 2
    qkv = jnp.asarray(rng.normal(size=(b, t, n, 3 * d)).astype(np.float32) * 0.3)
    ck = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)
    cv = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)
    cq = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)

    for mode in ("space", "time"):
        for base_kw in ({}, {"fused_den": True}):
            ref, (m0, s0, co0) = divided_patch_attention(
                qkv, ck, cv, cq, mode=mode, heads=heads, interpret=True, **base_kw
            )
            out, (m1, s1, co1) = divided_patch_attention(
                qkv, ck, cv, cq, mode=mode, heads=heads, interpret=True,
                coalesce_out=True, **base_kw,
            )
            for x, y in ((out, ref), (m1, m0), (s1, s0), (co1, co0)):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y), err_msg=f"{mode}/{base_kw}"
                )
        # composes with quant_out (the coalesced path drops the VMEM
        # scratch and quantizes the in-VREG accumulator)
        (q0, sx0), _ = divided_patch_attention(
            qkv, ck, cv, cq, mode=mode, heads=heads, interpret=True, quant_out=True
        )
        (q1, sx1), _ = divided_patch_attention(
            qkv, ck, cv, cq, mode=mode, heads=heads, interpret=True,
            quant_out=True, coalesce_out=True,
        )
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q0))
        np.testing.assert_array_equal(np.asarray(sx1), np.asarray(sx0))

    # full backbone: coalesced_epilogue flips only the store schedule
    cfg = SpaceTimeConfig(
        img_size=112, patch_size=14, width=128, depth=2, heads=2, num_frames=2,
        attention_backend="pallas_interpret",
    )
    params = init_spacetime_params(jax.random.PRNGKey(0), cfg)
    video = jnp.asarray(rng.normal(size=(1, 2, 112, 112, 3)).astype(np.float32))
    a_cls, a = spacetime_forward(params, cfg, video, use_remat=False, dtype=jnp.float32)
    b_cls, b = spacetime_forward(
        params, replace(cfg, coalesced_epilogue=True), video,
        use_remat=False, dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a_cls), np.asarray(b_cls))

    # per-mode policy strings resolve correctly and leave the math alone
    from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import (
        _coalesce_for,
    )

    assert _coalesce_for("time", "time") and not _coalesce_for("time", "space")
    assert _coalesce_for("all", "space") and not _coalesce_for("off", "time")
    assert _coalesce_for("time+space", "space") and _coalesce_for(True, "time")
    for policy in ("time", "space"):
        c_cls, c = spacetime_forward(
            params, replace(cfg, coalesced_epilogue=policy), video,
            use_remat=False, dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        np.testing.assert_array_equal(np.asarray(a_cls), np.asarray(c_cls))


def test_rows_kernel_long_tile_quant_out_interpret(rng):
    """quant_out through a long temporal tile (R = t*nb > 256, the
    raised-vmem_limit_bytes path): the quantized output must follow the
    int8_linear scale rule exactly, and the CLS streaming partials must
    be untouched by quant_out."""
    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        _temporal_block,
        divided_patch_attention,
    )

    b, t, n, d, heads = 1, 36, 8, 64, 1
    assert t * _temporal_block(t, n) > 256  # long-tile path
    qkv = jnp.asarray(rng.normal(size=(b, t, n, 3 * d)).astype(np.float32) * 0.3)
    ck = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)
    cv = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)
    cq = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.3)

    ref, (m0, s0, co0) = divided_patch_attention(
        qkv, ck, cv, cq, mode="time", heads=heads, interpret=True
    )
    (out_q, s_x), (m1, s1, co1) = divided_patch_attention(
        qkv, ck, cv, cq, mode="time", heads=heads, interpret=True, quant_out=True
    )
    assert out_q.dtype == jnp.int8 and s_x.shape == (b, t, n, 1)
    want_s = np.maximum(
        np.max(np.abs(np.asarray(ref)), axis=-1, keepdims=True) / 127.0, 1e-8
    )
    np.testing.assert_allclose(np.asarray(s_x), want_s, rtol=1e-5)
    deq = np.asarray(out_q, np.float32) * np.asarray(s_x)
    np.testing.assert_allclose(
        deq, np.asarray(ref), atol=float(np.max(want_s)) * 0.51 + 1e-6
    )
    # CLS streaming partials are untouched by quant_out
    for x, y in ((m1, m0), (s1, s0), (co1, co0)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
