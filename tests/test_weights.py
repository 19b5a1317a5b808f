"""Weight-converter tests: synthetic torch-layout state dicts -> pytrees.

Builds random state dicts with the reference's exact key layout (names
from model/LaviLa.py / model/tfm_decoder.py state dicts), converts them,
and checks structural mapping + numerical transposition via torch
functional oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from helping_hand_for_egocentric_videos_tpu.models import (
    DecoderConfig,
    SpaceTimeConfig,
    TextConfig,
    decoder_forward,
)
from helping_hand_for_egocentric_videos_tpu.models.lavila import LavilaConfig, lavila_forward
from helping_hand_for_egocentric_videos_tpu.models.weights import (
    convert_decoder_checkpoint,
    convert_lavila_checkpoint,
    inflate_temporal_embed,
)

R = np.random.default_rng(3)


def t(*shape):
    return R.normal(size=shape).astype(np.float32) * 0.05


def make_lavila_sd(depth=2, d=32, heads=4, patch=14, frames=2, tw=32, tl=2, ppf=4):
    sd = {}
    sd["visual.cls_token"] = t(1, 1, d)
    sd["visual.pos_embed"] = t(1, ppf + 1, d)
    sd["visual.temporal_embed"] = t(1, frames, d)
    sd["visual.patch_embed.proj.weight"] = t(d, 3, patch, patch)
    sd["visual.ln_pre.weight"] = np.ones(d, np.float32)
    sd["visual.ln_pre.bias"] = np.zeros(d, np.float32)
    for i in range(depth):
        p = f"visual.blocks.{i}"
        for nm in ("norm1", "norm2", "norm3"):
            sd[f"{p}.{nm}.weight"] = np.ones(d, np.float32)
            sd[f"{p}.{nm}.bias"] = np.zeros(d, np.float32)
        for at in ("attn", "timeattn"):
            sd[f"{p}.{at}.qkv.weight"] = t(3 * d, d)
            sd[f"{p}.{at}.qkv.bias"] = t(3 * d)
            sd[f"{p}.{at}.proj.weight"] = t(d, d)
            sd[f"{p}.{at}.proj.bias"] = t(d)
        sd[f"{p}.mlp.fc1.weight"] = t(4 * d, d)
        sd[f"{p}.mlp.fc1.bias"] = t(4 * d)
        sd[f"{p}.mlp.fc2.weight"] = t(d, 4 * d)
        sd[f"{p}.mlp.fc2.bias"] = t(d)
    sd["visual.norm.weight"] = np.ones(d, np.float32)
    sd["visual.norm.bias"] = np.zeros(d, np.float32)

    sd["token_embedding.weight"] = t(64, tw)
    sd["positional_embedding"] = t(12, tw)
    for i in range(tl):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = np.ones(tw, np.float32)
        sd[f"{p}.ln_1.bias"] = np.zeros(tw, np.float32)
        sd[f"{p}.ln_2.weight"] = np.ones(tw, np.float32)
        sd[f"{p}.ln_2.bias"] = np.zeros(tw, np.float32)
        sd[f"{p}.attn.in_proj_weight"] = t(3 * tw, tw)
        sd[f"{p}.attn.in_proj_bias"] = t(3 * tw)
        sd[f"{p}.attn.out_proj.weight"] = t(tw, tw)
        sd[f"{p}.attn.out_proj.bias"] = t(tw)
        sd[f"{p}.mlp.c_fc.weight"] = t(4 * tw, tw)
        sd[f"{p}.mlp.c_fc.bias"] = t(4 * tw)
        sd[f"{p}.mlp.c_proj.weight"] = t(tw, 4 * tw)
        sd[f"{p}.mlp.c_proj.bias"] = t(tw)
    sd["ln_final.weight"] = np.ones(tw, np.float32)
    sd["ln_final.bias"] = np.zeros(tw, np.float32)
    sd["text_projection"] = t(tw, 16)
    sd["image_projection"] = t(d, 16)
    sd["logit_scale"] = np.float32(np.log(1 / 0.07))
    return sd


def test_lavila_conversion_forward():
    sd = make_lavila_sd()
    params = convert_lavila_checkpoint(sd, visual_depth=2, text_layers=2)
    cfg = LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=28, patch_size=14, width=32, depth=2, heads=4, num_frames=2
        ),
        text=TextConfig(
            vocab_size=64, context_length=12, width=32, heads=4, layers=2, embed_dim=16
        ),
        embed_dim=16,
    )
    video = jnp.asarray(R.normal(size=(1, 2, 28, 28, 3)).astype(np.float32))
    tokens = jnp.zeros((1, 12), jnp.int32).at[0, 0].set(62).at[0, 1].set(63)
    out = lavila_forward(params, cfg, video, tokens, dtype=jnp.float32)
    assert out["image_embed"].shape == (1, 16)
    assert np.isfinite(np.asarray(out["image_feature_map"])).all()
    np.testing.assert_allclose(float(out["logit_scale"]), 1 / 0.07, rtol=1e-5)

    # patchify transposition check vs torch conv2d
    from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import patchify

    got = np.asarray(patchify(params["visual"], cfg.visual, video))
    conv = torch.nn.functional.conv2d(
        torch.tensor(np.asarray(video)[:, 0].transpose(0, 3, 1, 2)),
        torch.tensor(sd["visual.patch_embed.proj.weight"]),
        stride=14,
    )
    want = conv.flatten(2).transpose(2, 1).numpy()
    np.testing.assert_allclose(got[:, :4], want, atol=1e-4)


def make_decoder_sd(d=32, nl=2, q=5, nf=2, ppf=4, fdim=48, ncls=10):
    sd = {}
    sd["transformer.pre_norm.weight"] = np.ones(d, np.float32)
    sd["transformer.pre_norm.bias"] = np.zeros(d, np.float32)
    for i in range(nl):
        p = f"transformer.decoder.layers.{i}"
        for at in ("self_attn", "multihead_attn"):
            sd[f"{p}.{at}.in_proj_weight"] = t(3 * d, d)
            sd[f"{p}.{at}.in_proj_bias"] = t(3 * d)
            sd[f"{p}.{at}.out_proj.weight"] = t(d, d)
            sd[f"{p}.{at}.out_proj.bias"] = t(d)
        sd[f"{p}.linear1.weight"] = t(64, d)
        sd[f"{p}.linear1.bias"] = t(64)
        sd[f"{p}.linear2.weight"] = t(d, 64)
        sd[f"{p}.linear2.bias"] = t(d)
        for nm in ("norm1", "norm2", "norm3"):
            sd[f"{p}.{nm}.weight"] = np.ones(d, np.float32)
            sd[f"{p}.{nm}.bias"] = np.zeros(d, np.float32)
    sd["transformer.decoder.norm.weight"] = np.ones(d, np.float32)
    sd["transformer.decoder.norm.bias"] = np.zeros(d, np.float32)
    sd["query_embed.weight"] = t(q, d)
    sd["class_embed.weight"] = t(ncls + 1, d)
    sd["class_embed.bias"] = t(ncls + 1)
    for i in range(3):
        o = d if i < 2 else 4
        sd[f"bbox_embed.layers.{i}.weight"] = t(o, d)
        sd[f"bbox_embed.layers.{i}.bias"] = t(o)
    sd["proj.weight"] = t(d, fdim)
    sd["pos_embed"] = t(1, ppf + 1, d)
    sd["temporal_embed"] = t(1, nf, d)
    sd["frame_index.weight"] = t(nf, d)
    sd["frame_proj.weight"] = t(d, 2 * d)
    sd["frame_proj.bias"] = t(d)
    sd["txt_proj.1.weight"] = t(16, 24)
    sd["txt_proj.1.bias"] = t(16)
    sd["vid_proj.0.weight"] = t(16, 24)
    sd["vid_proj.0.bias"] = t(16)
    sd["obj_proj.0.weight"] = t(d, d)
    sd["obj_proj.0.bias"] = t(d)
    sd["obj_proj.2.weight"] = t(16, d)
    sd["obj_proj.2.bias"] = t(16)
    return sd


def test_decoder_conversion_forward():
    sd = make_decoder_sd()
    params = convert_decoder_checkpoint(sd, num_layers=2)
    cfg = DecoderConfig(
        d_model=32,
        nhead=4,
        num_layers=2,
        dim_feedforward=64,
        num_queries=5,
        num_classes=10,
        feature_dim=48,
        text_width=24,
        embed_dim=16,
        num_frames=2,
        patches_per_frame=4,
    )
    feats = jnp.asarray(R.normal(size=(2, 2, 4, 48)).astype(np.float32))
    out = decoder_forward(params, cfg, feats)
    assert out.pred_boxes.shape == (4, 5, 4)
    assert np.isfinite(np.asarray(out.pred_boxes)).all()

    # proj transposition check: memory projection vs torch functional
    got = np.asarray(feats.reshape(2, 8, 48) @ params["proj"]["w"])
    want = torch.nn.functional.linear(
        torch.tensor(np.asarray(feats).reshape(2, 8, 48)), torch.tensor(sd["proj.weight"])
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inflate_temporal_embed():
    te = np.zeros((1, 4, 8), np.float32)
    te[0, :, 0] = [0.0, 1.0, 2.0, 3.0]
    out = np.asarray(inflate_temporal_embed(jnp.asarray(te), 8))
    assert out.shape == (1, 8, 8)
    # monotone signal stays monotone and endpoints are preserved-ish
    col = out[0, :, 0]
    assert (np.diff(col) >= -1e-6).all()
    assert abs(col[0] - 0.0) < 0.5 and abs(col[-1] - 3.0) < 0.5
    # identity when already the right length
    same = np.asarray(inflate_temporal_embed(jnp.asarray(te), 4))
    np.testing.assert_array_equal(same, te)


def test_zoo_resolve_sha_verification(tmp_path, monkeypatch):
    """resolve(): explicit paths pass through; named models are searched in
    the cache dirs and SHA256-verified like the reference downloader
    (openai_clip.py:53-82); missing files raise with the published URL."""
    import pytest

    from helping_hand_for_egocentric_videos_tpu.models.zoo import (
        available_models,
        resolve,
    )

    assert "ViT-L/14" in available_models()

    f = tmp_path / "anything.pt"
    f.write_bytes(b"x")
    assert resolve(str(f)) == str(f)  # explicit path, no name lookup

    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "ViT-B-32.pt").write_bytes(b"not the real weights")
    with pytest.raises(RuntimeError, match="SHA256"):
        resolve("ViT-B/32", cache_dir=str(cache))
    assert resolve("ViT-B/32", cache_dir=str(cache), verify=False).endswith("ViT-B-32.pt")

    with pytest.raises(FileNotFoundError, match="openaipublic"):
        resolve("RN50", cache_dir=str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError, match="neither"):
        resolve("NoSuchModel", cache_dir=str(cache))


def test_load_torch_state_dict_torchscript_archive(tmp_path):
    """The official OpenAI CLIP releases are TorchScript archives; the
    loader must take the ScriptModule's state_dict (openai_clip.py:151-160
    fallback semantics)."""
    import pytest

    torch = pytest.importorskip("torch")

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(4, 2)

        def forward(self, x):
            return self.lin(x)

    m = torch.jit.script(M())
    path = tmp_path / "scripted.pt"
    torch.jit.save(m, str(path))

    from helping_hand_for_egocentric_videos_tpu.models.weights import (
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(str(path))
    assert set(sd) == {"lin.weight", "lin.bias"}
    assert sd["lin.weight"].shape == (2, 4)
