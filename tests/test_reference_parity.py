"""Numerical parity against the actual reference implementation.

Builds the reference PyTorch modules (mounted read-only at
/root/reference) with small configs and *random* weights, converts the
torch state dicts through ``models/weights.py``, and asserts allclose
between the torch forward and this framework's forward in f32.

Covered (VERDICT round-1 item 2):
- SpaceTimeTransformer ``forward_features`` end-to-end, which exercises
  VarAttention space+time (model/LaviLa.py:226-283) and SpaceTimeBlock
  (L:345-390) with non-zero temporal weights;
- CLIP text tower + EOT projection (model/LaviLa.py:660-670);
- full CLIP.forward(..., return_feature_map=True) (L:672-687);
- ObjDecoder.forward pred_boxes/pred_logits/aux/hs (model/tfm_decoder.py:
  183-233), both the nq=13 and the nq==1/query_index modes;
- EgoNCE single- and multi-positive (model/loss.py:15-70);
- WordContrastiveLoss (model/loss.py:72-106);
- inflate_positional_embeds' bilinear temporal inflation
  (run/test_egtea.py:46-96).

The reference needs timm / torchvision / ftfy, which are not installed;
tiny stand-in modules providing exactly the symbols it imports are
registered first (DropPath/to_2tuple/trunc_normal_ and import-time
placeholders that the tested code paths never call).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "model")),
    reason="reference repo not mounted",
)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def _stub_module(name):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def _install_stubs():
    import torch.nn as nn

    if "timm" not in sys.modules:
        class DropPath(nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob or 0.0

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
                return x.div(keep) * mask.floor_()

        layers = _stub_module("timm.models.layers")
        layers.DropPath = DropPath
        layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        layers.trunc_normal_ = nn.init.trunc_normal_
        timm = _stub_module("timm")
        models = _stub_module("timm.models")
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tfs = _stub_module("torchvision.transforms")
        for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
            setattr(tfs, name, type(name, (), {}))
        tfs.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tv.transforms = tfs

        def _box_area(boxes):
            return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

        ops = _stub_module("torchvision.ops")
        ops_boxes = _stub_module("torchvision.ops.boxes")
        ops_boxes.box_area = _box_area
        ops.boxes = ops_boxes
        ops.misc = _stub_module("torchvision.ops.misc")
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tfs
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.boxes"] = ops_boxes
        sys.modules["torchvision.ops.misc"] = ops.misc

    if "ftfy" not in sys.modules:
        ftfy = _stub_module("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy

    # base/base_dataset.py imports the decode wheels at module level; the
    # sampler-math oracles below need none of them
    for name in ("av", "decord", "ffmpeg"):
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
    # module level also runs decord.bridge.set_bridge("torch")
    sys.modules["decord"].bridge = types.SimpleNamespace(set_bridge=lambda *a: None)
    if "iopath" not in sys.modules:
        iopath = _stub_module("iopath")
        common = _stub_module("iopath.common")
        file_io = _stub_module("iopath.common.file_io")
        file_io.g_pathmgr = types.SimpleNamespace(open=open, exists=os.path.exists)
        common.file_io = file_io
        iopath.common = common
        sys.modules["iopath"] = iopath
        sys.modules["iopath.common"] = common
        sys.modules["iopath.common.file_io"] = file_io

    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            import packaging

            pr = _stub_module("pkg_resources")
            pr.packaging = packaging
            sys.modules["pkg_resources"] = pr

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


_install_stubs()

from model.LaviLa import CLIP, SpaceTimeTransformer  # noqa: E402
from model.loss import EgoNCE, WordContrastiveLoss  # noqa: E402
from model.openai_model import QuickGELU  # noqa: E402
from model.tfm_decoder import Cross_Attention, ObjDecoder  # noqa: E402

from helping_hand_for_egocentric_videos_tpu.losses import (  # noqa: E402
    egonce_loss,
    egonce_multi_positive_loss,
    word_contrastive_loss,
)
from helping_hand_for_egocentric_videos_tpu.models import (  # noqa: E402
    DecoderConfig,
    decoder_forward,
    init_decoder_params,
    init_lavila_params,
)
from helping_hand_for_egocentric_videos_tpu.models import obj_decoder as dec_mod  # noqa: E402
from helping_hand_for_egocentric_videos_tpu.models.clip_text import (  # noqa: E402
    TextConfig,
    encode_text,
)
from helping_hand_for_egocentric_videos_tpu.models.lavila import (  # noqa: E402
    LavilaConfig,
    lavila_forward,
)
from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import (  # noqa: E402
    SpaceTimeConfig,
    spacetime_forward,
)
from helping_hand_for_egocentric_videos_tpu.models.weights import (  # noqa: E402
    convert_decoder_checkpoint,
    convert_lavila_checkpoint,
    inflate_temporal_embed,
)

# small-but-structured dims: 2x2 patch grid, 4 frames, 4 heads
T, IMG, PATCH, WIDTH, DEPTH, HEADS = 4, 28, 14, 32, 2, 4


def randomize_(module, seed):
    """Fill every parameter with healthy random values (LN gammas near 1)
    so parity is tested with non-degenerate weights — incl. the zero-init
    temporal attention."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if p.ndim <= 1 and name.endswith("weight"):
                p.copy_(1.0 + 0.2 * torch.randn(p.shape, generator=g))
            elif p.ndim == 0 or name.endswith("logit_scale"):
                pass
            else:
                p.copy_(0.05 * torch.randn(p.shape, generator=g))


def sd_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def make_vision_tower(num_frames=T, seed=0):
    torch.manual_seed(seed)
    m = SpaceTimeTransformer(
        img_size=IMG,
        patch_size=PATCH,
        embed_dim=WIDTH,
        depth=DEPTH,
        num_heads=HEADS,
        num_frames=num_frames,
        num_classes=0,  # head = Identity, like the factory (LaviLa.py:148-150)
        time_init="zeros",
        attention_style="frozen-in-time",
        ln_pre=True,
        act_layer=QuickGELU,
    )
    randomize_(m, seed + 1)
    return m.eval()


def vision_cfg(num_frames=T):
    return SpaceTimeConfig(
        img_size=IMG,
        patch_size=PATCH,
        width=WIDTH,
        depth=DEPTH,
        heads=HEADS,
        num_frames=num_frames,
    )


def make_clip(num_frames=T, seed=0):
    torch.manual_seed(seed)
    model = CLIP(
        embed_dim=16,
        vision_width=WIDTH,
        vision_model=make_vision_tower(num_frames, seed),
        context_length=12,
        vocab_size=64,
        transformer_width=32,
        transformer_heads=4,
        transformer_layers=2,
        tempearture_init=0.07,
    )
    randomize_(model.transformer, seed + 2)
    randomize_(model.ln_final, seed + 3)
    with torch.no_grad():
        model.token_embedding.weight.copy_(
            0.05 * torch.randn(model.token_embedding.weight.shape)
        )
        model.positional_embedding.copy_(
            0.05 * torch.randn(model.positional_embedding.shape)
        )
    return model.eval()


def clip_cfg(num_frames=T):
    return LavilaConfig(
        visual=vision_cfg(num_frames),
        text=TextConfig(
            vocab_size=64, context_length=12, width=32, heads=4, layers=2, embed_dim=16
        ),
        embed_dim=16,
    )


def rand_video(rng, b, t=T):
    return rng.normal(size=(b, t, IMG, IMG, 3)).astype(np.float32)


def rand_tokens(rng, b, length=12, vocab=64):
    toks = rng.integers(1, vocab - 2, size=(b, length)).astype(np.int64)
    toks[:, 0] = vocab - 2  # SOT-ish
    eot_pos = rng.integers(3, length, size=b)
    for i in range(b):
        toks[i, eot_pos[i]] = vocab - 1  # EOT = highest id (argmax lookup)
        toks[i, eot_pos[i] + 1 :] = 0
    return toks


def test_spacetime_forward_features_parity(rng):
    """forward_features end-to-end: VarAttention space+time + SpaceTimeBlock
    + patchify + pos/temporal tiling + ln_pre/norm (model/LaviLa.py:537-573)."""
    tower = make_vision_tower()
    video = rand_video(rng, b=2)
    with torch.no_grad():
        x_cls_t, x_t = tower.forward_features(
            torch.from_numpy(video).permute(0, 1, 4, 2, 3)
        )

    # full-CLIP converter prefixes; build a faux CLIP sd namespace
    sd = {f"visual.{k}": v for k, v in sd_np(tower).items()}
    params = convert_lavila_checkpoint(sd, visual_depth=DEPTH, text_layers=0)

    cfg = vision_cfg()
    x_cls_j, x_j = spacetime_forward(
        params["visual"], cfg, jnp.asarray(video), use_remat=False, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(x_j), x_t.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(x_cls_j), x_cls_t.numpy(), rtol=1e-4, atol=2e-5
    )


def test_spacetime_two_frame_parity(rng):
    """A tower built at num_frames=2 (the reference cannot actually run
    T < num_frames — the embed add at model/LaviLa.py:553 shape-errors;
    frame-count changes go through inflate_positional_embeds instead)."""
    tower = make_vision_tower(num_frames=2)
    video = rand_video(rng, b=1, t=2)
    with torch.no_grad():
        _, x_t = tower.forward_features(
            torch.from_numpy(video).permute(0, 1, 4, 2, 3)
        )
    sd = {f"visual.{k}": v for k, v in sd_np(tower).items()}
    params = convert_lavila_checkpoint(sd, visual_depth=DEPTH, text_layers=0)
    _, x_j = spacetime_forward(
        params["visual"], vision_cfg(num_frames=2), jnp.asarray(video),
        use_remat=False, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy(), rtol=1e-4, atol=2e-5)


def test_text_tower_parity(rng):
    clip = make_clip()
    tokens = rand_tokens(rng, b=3)
    with torch.no_grad():
        x_cls_t, x_t = clip.encode_text(torch.from_numpy(tokens))

    params = convert_lavila_checkpoint(sd_np(clip), visual_depth=DEPTH, text_layers=2)
    cfg = clip_cfg()
    x_cls_j, x_j = encode_text(
        params["text"], cfg.text, jnp.asarray(tokens.astype(np.int32))
    )
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(x_cls_j), x_cls_t.numpy(), rtol=1e-4, atol=2e-5
    )


def test_clip_forward_parity(rng):
    """CLIP.forward(..., return_feature_map=True) (model/LaviLa.py:672-687)."""
    clip = make_clip()
    video = rand_video(rng, b=2)
    tokens = rand_tokens(rng, b=2)
    with torch.no_grad():
        out_t = clip(
            torch.from_numpy(video).permute(0, 1, 4, 2, 3),
            torch.from_numpy(tokens),
            return_feature_map=True,
        )

    params = convert_lavila_checkpoint(sd_np(clip), visual_depth=DEPTH, text_layers=2)
    cfg = clip_cfg()
    out_j = lavila_forward(
        params, cfg, jnp.asarray(video), jnp.asarray(tokens.astype(np.int32)),
        use_remat=False, dtype=jnp.float32,
    )
    for key in ("image_embed", "text_embed", "image_feature_map", "text_feature_map"):
        np.testing.assert_allclose(
            np.asarray(out_j[key]), out_t[key].numpy(), rtol=1e-4, atol=2e-5,
            err_msg=key,
        )
    np.testing.assert_allclose(
        float(out_j["logit_scale"]), float(out_t["logit_scale"]), rtol=1e-5
    )


def _make_ref_decoder(num_queries, seed=0, pred_traj=True):
    torch.manual_seed(seed)
    transformer = Cross_Attention(
        d_model=32,
        nhead=4,
        num_decoder_layers=2,
        dim_feedforward=64,
        dropout=0.1,
        normalize_before=True,
        return_intermediate_dec=True,
    )
    dec = ObjDecoder(
        transformer=transformer,
        num_classes=8,
        num_queries=num_queries,
        feature_dim=WIDTH,
        aux_loss=True,
        pred_traj=pred_traj,
        num_frames=T,
        patches_per_frame=4,
    )
    randomize_(dec, seed + 1)
    return dec.eval()


def _my_dec_cfg(num_queries, pred_traj=True):
    return DecoderConfig(
        d_model=32,
        nhead=4,
        num_layers=2,
        dim_feedforward=64,
        num_queries=num_queries,
        num_classes=8,
        feature_dim=WIDTH,
        text_width=768,
        embed_dim=256,
        num_frames=T,
        patches_per_frame=4,
        pred_traj=pred_traj,
    )


@pytest.mark.parametrize("num_queries", [13, 1])
def test_obj_decoder_parity(rng, num_queries):
    """ObjDecoder.forward: boxes/logits/aux/hs (model/tfm_decoder.py:183-233),
    nq=13 trajectory mode and the nq==1 query_index mode."""
    dec = _make_ref_decoder(num_queries)
    b = 2
    feats = rng.normal(size=(b, T, 4, WIDTH)).astype(np.float32)
    with torch.no_grad():
        out_t, hs_t, _, _ = dec(torch.from_numpy(feats))

    params = convert_decoder_checkpoint(sd_np(dec), num_layers=2)
    cfg = _my_dec_cfg(num_queries)
    out_j = decoder_forward(params, cfg, jnp.asarray(feats))

    np.testing.assert_allclose(
        np.asarray(out_j.hs), hs_t.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_j.pred_boxes), out_t["pred_boxes"].numpy(),
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_j.pred_logits), out_t["pred_logits"].numpy(),
        rtol=1e-4, atol=2e-5,
    )
    for i, aux in enumerate(out_t["aux_outputs"]):
        np.testing.assert_allclose(
            np.asarray(out_j.aux_pred_boxes[i]), aux["pred_boxes"].numpy(),
            rtol=1e-4, atol=2e-5, err_msg=f"aux {i} boxes",
        )
        np.testing.assert_allclose(
            np.asarray(out_j.aux_pred_logits[i]), aux["pred_logits"].numpy(),
            rtol=1e-4, atol=2e-5, err_msg=f"aux {i} logits",
        )


def test_obj_decoder_no_traj_parity(rng):
    """pred_traj=False (the Epic/EGTEA eval decoder, run/test_epic.py:151):
    boxes come straight from hs (tfm_decoder.py:210,225-228)."""
    dec = _make_ref_decoder(13, pred_traj=False)
    feats = rng.normal(size=(1, T, 4, WIDTH)).astype(np.float32)
    with torch.no_grad():
        out_t, hs_t, _, _ = dec(torch.from_numpy(feats))
    params = convert_decoder_checkpoint(sd_np(dec), num_layers=2)
    out_j = decoder_forward(params, _my_dec_cfg(13, pred_traj=False), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(out_j.hs), hs_t.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_j.pred_boxes), out_t["pred_boxes"].numpy(), rtol=1e-4, atol=2e-5
    )


def test_proj_heads_parity(rng):
    """txt_proj / vid_proj / obj_proj heads (tfm_decoder.py:168-180)."""
    dec = _make_ref_decoder(13)
    params = convert_decoder_checkpoint(sd_np(dec), num_layers=2)
    x768 = rng.normal(size=(3, 768)).astype(np.float32)
    x512 = rng.normal(size=(3, 32)).astype(np.float32)
    with torch.no_grad():
        txt_t = dec.txt_proj(torch.from_numpy(x768)).numpy()
        vid_t = dec.vid_proj(torch.from_numpy(x768)).numpy()
        obj_t = dec.obj_proj(torch.from_numpy(x512)).numpy()
    np.testing.assert_allclose(
        np.asarray(dec_mod.txt_proj(params, jnp.asarray(x768))), txt_t,
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(dec_mod.vid_proj(params, jnp.asarray(x768))), vid_t,
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(dec_mod.obj_proj(params, jnp.asarray(x512))), obj_t,
        rtol=1e-4, atol=2e-5,
    )


def _tag_mask(rng, n, dims, p=0.4):
    vecs = (rng.random((n, dims)) < p).astype(np.float32)
    m = (vecs @ vecs.T > 0).astype(np.float32)
    return m


def test_egonce_single_positive_parity(rng):
    n = 6
    sim = np.tanh(rng.normal(size=(n, n))).astype(np.float32)
    mask_v = _tag_mask(rng, n, 10)
    mask_n = _tag_mask(rng, n, 20)
    with torch.no_grad():
        loss_t, mask_t = EgoNCE()(
            torch.from_numpy(sim), torch.from_numpy(mask_v), torch.from_numpy(mask_n)
        )
    loss_j, mask_j = egonce_loss(
        jnp.asarray(sim), jnp.asarray(mask_v), jnp.asarray(mask_n)
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask_j), mask_t.numpy())


def test_egonce_multi_positive_parity(rng):
    n, r = 4, 5
    sim = np.tanh(rng.normal(size=(n * r, n))).astype(np.float32)
    mask_v = _tag_mask(rng, n, 10)
    mask_n = _tag_mask(rng, n, 20)
    # row-constant pad mask; rephrase 0 (the original caption) always valid
    row_valid = (rng.random(n * r) > 0.3).astype(np.float32)
    row_valid[::r] = 1.0
    pad = np.broadcast_to(row_valid[:, None], (n * r, n)).copy()
    with torch.no_grad():
        loss_t, _ = EgoNCE()(
            torch.from_numpy(sim),
            torch.from_numpy(mask_v),
            torch.from_numpy(mask_n),
            multi_pad_mask=torch.from_numpy(pad),
        )
    loss_j, _ = egonce_multi_positive_loss(
        jnp.asarray(sim), jnp.asarray(mask_v), jnp.asarray(mask_n), jnp.asarray(pad)
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5, atol=1e-6)


def test_egonce_multi_positive_all_valid_parity(rng):
    n, r = 3, 5
    sim = np.tanh(rng.normal(size=(n * r, n))).astype(np.float32)
    pad = np.ones((n * r, n), np.float32)
    mask_v = _tag_mask(rng, n, 8)
    mask_n = _tag_mask(rng, n, 8)
    with torch.no_grad():
        loss_t, _ = EgoNCE()(
            torch.from_numpy(sim),
            torch.from_numpy(mask_v),
            torch.from_numpy(mask_n),
            multi_pad_mask=torch.from_numpy(pad),
        )
    loss_j, _ = egonce_multi_positive_loss(
        jnp.asarray(sim), jnp.asarray(mask_v), jnp.asarray(mask_n), jnp.asarray(pad)
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5, atol=1e-6)


def test_word_contrastive_parity(rng):
    v, e, b, q, m = 30, 16, 3, 5, 4
    noun_embeds = rng.normal(size=(v, e)).astype(np.float32)
    preds = rng.normal(size=(b, q, e)).astype(np.float32)
    gt = np.zeros((b, m), np.int64)
    gt[0, :2] = [3, 7]
    gt[1, :4] = [1, 9, 12, 20]
    gt[2, :1] = [25]
    with torch.no_grad():
        loss_t = WordContrastiveLoss()(
            torch.from_numpy(noun_embeds),
            torch.from_numpy(preds),
            torch.from_numpy(gt),
        )
    loss_j = word_contrastive_loss(
        jnp.asarray(noun_embeds), jnp.asarray(preds), jnp.asarray(gt.astype(np.int32))
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5, atol=1e-6)


def test_openai_clip_bootstrap_parity(rng):
    """Raw OpenAI CLIP -> TimeSformer bootstrap: our converter must match
    the reference factory path — remap_keys + strict=False load with
    time_init='zeros' (model/LaviLa.py:19-53, run/train.py:425-431) — and
    the text tower must load verbatim."""
    import model.openai_model as openai_model
    from model.LaviLa import remap_keys

    from helping_hand_for_egocentric_videos_tpu.models.weights import (
        convert_openai_clip_checkpoint,
    )

    torch.manual_seed(7)
    # vision_heads = width // 64 in the OpenAI wiring -> width 64, 1 head
    clip = openai_model.CLIP(
        embed_dim=16,
        image_resolution=IMG,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=PATCH,
        context_length=12,
        vocab_size=64,
        transformer_width=32,
        transformer_heads=4,
        transformer_layers=2,
    ).float()
    randomize_(clip, 8)
    clip = clip.eval()

    params = convert_openai_clip_checkpoint(
        sd_np(clip), num_frames=T, project_embed_dim=16
    )

    # reference factory path as oracle: remapped CLIP weights into a
    # TimeSformer with zero-init time attention
    ref_tower = SpaceTimeTransformer(
        img_size=IMG,
        patch_size=PATCH,
        embed_dim=64,
        depth=2,
        num_heads=1,
        num_frames=T,
        num_classes=0,
        time_init="zeros",
        attention_style="frozen-in-time",
        ln_pre=True,
        act_layer=QuickGELU,
    ).eval()
    remapped = remap_keys(clip.visual.state_dict(), transformer_layers=2)
    res = ref_tower.load_state_dict(remapped, strict=False)
    assert not res.unexpected_keys

    video = rng.normal(size=(2, T, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        cls_t, x_t = ref_tower.forward_features(
            torch.from_numpy(video).permute(0, 1, 4, 2, 3)
        )
    cfg = SpaceTimeConfig(
        img_size=IMG, patch_size=PATCH, width=64, depth=2, heads=1, num_frames=T
    )
    cls_j, x_j = spacetime_forward(
        params["visual"], cfg, jnp.asarray(video), use_remat=False, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy(), rtol=1e-4, atol=2e-5)

    # matching projection dims -> CLIP projections adopted verbatim
    np.testing.assert_allclose(
        np.asarray(params["image_projection"]), clip.visual.proj.detach().numpy()
    )
    with torch.no_grad():
        proj_t = (cls_t @ clip.visual.proj).numpy()
    np.testing.assert_allclose(
        np.asarray(cls_j @ params["image_projection"]), proj_t, rtol=1e-4, atol=2e-5
    )

    # text tower verbatim: oracle = OpenAI CLIP encode_text
    tokens = rand_tokens(rng, b=2)
    with torch.no_grad():
        txt_t = clip.encode_text(torch.from_numpy(tokens)).numpy()
    tcfg = TextConfig(
        vocab_size=64, context_length=12, width=32, heads=4, layers=2, embed_dim=16
    )
    txt_j, _ = encode_text(params["text"], tcfg, jnp.asarray(tokens.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(txt_j), txt_t, rtol=1e-4, atol=2e-5)


def test_openai_bootstrap_mismatched_proj_dims(rng):
    """project_embed_dim != CLIP embed dim -> fresh CLIP-scheme projections
    (run/train.py factory keeps its random init, model/LaviLa.py:165-171)."""
    import model.openai_model as openai_model

    from helping_hand_for_egocentric_videos_tpu.models.weights import (
        convert_openai_clip_checkpoint,
    )

    torch.manual_seed(9)
    clip = openai_model.CLIP(
        embed_dim=16,
        image_resolution=IMG,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=PATCH,
        context_length=12,
        vocab_size=64,
        transformer_width=32,
        transformer_heads=4,
        transformer_layers=2,
    ).float()
    params = convert_openai_clip_checkpoint(
        sd_np(clip), num_frames=T, project_embed_dim=8
    )
    assert params["image_projection"].shape == (64, 8)
    assert params["text"]["text_projection"].shape == (32, 8)
    assert params["visual"]["temporal_embed"].shape == (1, T, 64)
    # zero-init time attention: stacked block qkv all zero, proj all one
    assert float(jnp.abs(params["visual"]["blocks"]["timeattn"]["qkv"]["w"]).max()) == 0
    assert float(params["visual"]["blocks"]["timeattn"]["proj"]["w"].min()) == 1.0


def test_inflate_temporal_embed_parity(rng):
    """Bilinear 4->16 temporal inflation must match F.interpolate
    (run/test_egtea.py:74-88: unsqueeze to an image, bilinear, squeeze)."""
    te = rng.normal(size=(1, 4, 24)).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(te).unsqueeze(0), (16, 24), mode="bilinear"
        ).squeeze(0)
    ours = inflate_temporal_embed(jnp.asarray(te), 16)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_inflate_temporal_embed_truncates(rng):
    """More loaded frames than needed -> slice, not interpolate
    (run/test_egtea.py:66-68)."""
    te = rng.normal(size=(1, 16, 8)).astype(np.float32)
    ours = inflate_temporal_embed(jnp.asarray(te), 4)
    assert ours.shape == (1, 4, 8)


def test_clip_vit_image_tower_parity(rng):
    """OpenAI CLIP VisionTransformer (openai_model.py:235-273) vs
    models/clip_image.py: CLS embedding (projected and raw) and the
    cls_at_last=False patch feature map."""
    from model.openai_model import VisionTransformer

    from helping_hand_for_egocentric_videos_tpu.models.clip_image import (
        clip_vit_encode,
        convert_openai_vit_tower,
    )

    torch.manual_seed(0)
    # width 128 -> the converter's build_model-style head sniffing
    # (width // 64, openai_model.py:470) matches the constructed heads=2
    ref = VisionTransformer(
        input_resolution=56, patch_size=14, width=128, layers=3, heads=2, output_dim=32
    ).eval()
    cfg, params = convert_openai_vit_tower(ref.state_dict(), prefix="")
    assert (cfg.width, cfg.layers, cfg.patch_size, cfg.output_dim, cfg.heads) == (
        128, 3, 14, 32, 2,
    )

    imgs = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
        want_raw = ref(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), apply_project=False
        ).numpy()
        want_map = ref(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), cls_at_last=False
        ).numpy()

    got = np.asarray(clip_vit_encode(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=2e-5)
    got_raw = np.asarray(
        clip_vit_encode(params, cfg, jnp.asarray(imgs), apply_project=False)
    )
    np.testing.assert_allclose(got_raw, want_raw, atol=2e-5)
    got_map = np.asarray(
        clip_vit_encode(params, cfg, jnp.asarray(imgs), cls_at_last=False)
    )
    np.testing.assert_allclose(got_map, want_map, atol=2e-5)


def test_clip_resnet_image_tower_parity(rng):
    """OpenAI CLIP ModifiedResNet + AttentionPool2d (openai_model.py:21-165)
    vs models/clip_image.py, including the anti-aliased downsample path."""
    from model.openai_model import ModifiedResNet

    from helping_hand_for_egocentric_videos_tpu.models.clip_image import (
        clip_resnet_encode,
        convert_openai_resnet_tower,
    )

    torch.manual_seed(0)
    ref = ModifiedResNet(
        layers=(1, 1, 1, 1), output_dim=32, heads=4, input_resolution=64, width=8
    ).eval()
    # randomize BN running stats so inference-mode BN is actually exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    cfg, params = convert_openai_resnet_tower(ref.state_dict(), prefix="")
    assert cfg.layers == (1, 1, 1, 1) and cfg.width == 8 and cfg.output_dim == 32

    imgs = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(clip_resnet_encode(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=3e-5)

    # the stem DIRECTLY (the final-embedding check above is dominated by
    # the attnpool positional embedding at torch-default weight scales,
    # and once hid a stride-2 window misalignment: XLA SAME sampled rows
    # [2j, 2j+2] where torch padding=1 samples [2j-1, 2j+1])
    from helping_hand_for_egocentric_videos_tpu.models import clip_image as ci

    with torch.no_grad():
        t = torch.from_numpy(imgs).permute(0, 3, 1, 2)
        for i in (1, 2, 3):
            t = getattr(ref, f"relu{i}")(
                getattr(ref, f"bn{i}")(getattr(ref, f"conv{i}")(t))
            )
        t = ref.avgpool(t)
        stem_want = t.permute(0, 2, 3, 1).numpy()
    x = jnp.asarray(imgs)
    x = jax.nn.relu(ci._bn(params["bn1"], ci._conv(params["conv1"], x, stride=2)))
    x = jax.nn.relu(ci._bn(params["bn2"], ci._conv(params["conv2"], x)))
    x = jax.nn.relu(ci._bn(params["bn3"], ci._conv(params["conv3"], x)))
    stem_got = np.asarray(ci._avgpool(x, 2))
    assert stem_want.std() > 1e-4  # the comparison is load-bearing
    np.testing.assert_allclose(stem_got, stem_want, atol=3e-6, rtol=1e-4)


def test_zoo_load_clip_full_checkpoint_parity(rng, tmp_path):
    """models/zoo.load_clip vs the reference CLIP (openai_model.py:275-418):
    a full small ViT CLIP checkpoint round-trips through the zoo loader and
    matches encode_image / encode_text / logit_scale."""
    from model.openai_model import CLIP as RefCLIP

    from helping_hand_for_egocentric_videos_tpu.models.clip_text import encode_text
    from helping_hand_for_egocentric_videos_tpu.models.zoo import load_clip

    torch.manual_seed(1)
    ref = RefCLIP(
        embed_dim=32,
        image_resolution=56,
        vision_layers=2,
        vision_width=128,
        vision_patch_size=14,
        context_length=16,
        vocab_size=64,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=2,
    ).eval()
    path = tmp_path / "tiny_clip.pt"
    torch.save(ref.state_dict(), str(path))

    z = load_clip(str(path))
    assert z["kind"] == "vit"
    assert z["text_cfg"].layers == 2 and z["text_cfg"].width == 128

    imgs = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    tokens = np.zeros((2, 16), np.int64)
    tokens[:, 0] = 1
    tokens[0, 1:4] = [5, 9, 63]  # 63 = max id = EOT position 3
    tokens[1, 1:3] = [8, 63]
    with torch.no_grad():
        want_img = ref.encode_image(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
        want_txt = ref.encode_text(torch.from_numpy(tokens)).numpy()

    got_img = np.asarray(z["encode_image"](z["visual_params"], z["visual_cfg"], jnp.asarray(imgs)))
    np.testing.assert_allclose(got_img, want_img, atol=3e-5)
    got_txt, _ = encode_text(z["text_params"], z["text_cfg"], jnp.asarray(tokens.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got_txt), want_txt, atol=3e-5)
    np.testing.assert_allclose(float(z["logit_scale"]), float(ref.logit_scale), rtol=1e-6)


def test_pnr_keyframe_distance_parity(rng):
    """pnr_keyframe_distance vs the reference pnr_metrics
    (model/metric.py:319-362) on random predictions/annotations."""
    from model.metric import pnr_metrics

    from helping_hand_for_egocentric_videos_tpu.metrics.charades import (
        pnr_keyframe_distance,
    )

    n = 12
    preds = rng.normal(size=(n, 16)).astype(np.float32)
    sc = (rng.random(n) < 0.7).astype(np.int64)
    fps = rng.uniform(25, 31, n).astype(np.float32)
    start = rng.integers(0, 1000, n).astype(np.float32)
    end = start + rng.integers(30, 120, n).astype(np.float32)
    pnr = start + (end - start) * rng.random(n).astype(np.float32)

    want = pnr_metrics(
        torch.from_numpy(preds),
        torch.zeros(n),
        torch.from_numpy(sc),
        torch.from_numpy(fps),
        torch.from_numpy(start),
        torch.from_numpy(end),
        torch.from_numpy(pnr),
    )["keyframe_distance"]
    got = pnr_keyframe_distance(preds, sc, fps, start, end, pnr)
    np.testing.assert_allclose(got, float(want), rtol=1e-6)


def test_position_embedding_sine_parity(rng):
    """position_embedding_sine vs the reference PositionEmbeddingSine
    (model/tfm_decoder.py:13-47), normalized and unnormalized."""
    from model.tfm_decoder import PositionEmbeddingSine

    from helping_hand_for_egocentric_videos_tpu.models.obj_decoder import (
        position_embedding_sine,
    )

    mask = np.zeros((2, 6, 9), bool)
    mask[0, 4:, :] = True  # padded rows
    mask[1, :, 7:] = True
    for normalize in (False, True):
        ref = PositionEmbeddingSine(num_pos_feats=32, normalize=normalize)
        with torch.no_grad():
            want = ref(torch.from_numpy(mask)).numpy()
        got = np.asarray(
            position_embedding_sine(jnp.asarray(mask), num_pos_feats=32, normalize=normalize)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_eval_model_end_to_end_parity(rng):
    """The WHOLE zero-shot eval path against the reference EgoMCQ math
    (run/test_EgoMCQ.py:56-79 + the val transform): uint8 candidate clips
    -> /255 -> Resize (tensor bilinear, no antialias) -> LaviLa normalize
    -> frozen backbone feature map -> ObjDecoder -> obj_proj summary query
    / txt_proj at EOT -> similarity row. Catches wiring divergences the
    per-module parity tests cannot (preprocess constants, EOT lookup, grid
    reshape, embed selection)."""
    import torch.nn.functional as Fт  # noqa: PLC2401

    from helping_hand_for_egocentric_videos_tpu.ops.preprocess import (
        LAVILA_MEAN,
        LAVILA_STD,
    )
    from helping_hand_for_egocentric_videos_tpu.train.evaluate import EvalModel

    # tiny CLIP but with the real 768-wide text tower (the reference
    # ObjDecoder hard-codes txt_proj = Linear(768, 256), tfm_decoder:168-173)
    torch.manual_seed(5)
    clip = CLIP(
        embed_dim=16,
        vision_width=WIDTH,
        vision_model=make_vision_tower(T, seed=5),
        context_length=12,
        vocab_size=64,
        transformer_width=768,
        transformer_heads=4,
        transformer_layers=2,
        tempearture_init=0.07,
    )
    randomize_(clip.transformer, 6)
    randomize_(clip.ln_final, 7)
    with torch.no_grad():
        clip.token_embedding.weight.copy_(
            0.05 * torch.randn(clip.token_embedding.weight.shape)
        )
        clip.positional_embedding.copy_(
            0.05 * torch.randn(clip.positional_embedding.shape)
        )
    clip = clip.eval()
    dec = _make_ref_decoder(5, seed=8)

    n_cand = 5
    video_u8 = (rng.random((n_cand, T, 40, 56, 3)) * 255).astype(np.uint8)
    tokens = rand_tokens(rng, 1)

    # ---- reference side: val transform + eval math
    with torch.no_grad():
        v = torch.from_numpy(video_u8.astype(np.float32) / 255.0)
        v = v.permute(0, 1, 4, 2, 3).flatten(0, 1)  # (5T, C, H, W)
        v = Fт.interpolate(v, size=(IMG, IMG), mode="bilinear", align_corners=False)
        mean = torch.tensor(LAVILA_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(LAVILA_STD).view(1, 3, 1, 1)
        v = ((v - mean) / std).reshape(n_cand, T, 3, IMG, IMG)
        out = clip(v, torch.from_numpy(tokens), return_feature_map=True)
        image_fmap = out["image_feature_map"]
        text_fmap = out["text_feature_map"]
        grid = image_fmap[:, 1:].reshape(n_cand, T, -1, WIDTH)
        model_out, hs, _, _ = dec(grid)
        eot = tokens.argmax(-1)
        want_text = dec.txt_proj(text_fmap[torch.arange(1), eot]).numpy()
        want_vids = dec.obj_proj(hs[-1])[:, -1].numpy()

    # ---- this framework: EvalModel with converted weights
    backbone = convert_lavila_checkpoint(sd_np(clip), visual_depth=DEPTH, text_layers=2)
    decoder = convert_decoder_checkpoint(sd_np(dec), num_layers=2)
    model = EvalModel(
        backbone_params=backbone,
        lavila_cfg=LavilaConfig(
            visual=vision_cfg(T),
            text=TextConfig(
                vocab_size=64, context_length=12, width=768, heads=4,
                layers=2, embed_dim=16,
            ),
            embed_dim=16,
        ),
        decoder_params=decoder,
        dec_cfg=_my_dec_cfg(5),
        tokenizer=None,  # tokens passed directly below
        input_res=IMG,
        dtype=jnp.float32,
    )
    got_vids, _ = model.embed_video(video_u8)
    got_text = np.asarray(
        model._embed_text(model.backbone_params, model.decoder_params,
                          jnp.asarray(tokens.astype(np.int32)))
    )

    np.testing.assert_allclose(got_text, want_text, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(got_vids, want_vids, rtol=1e-4, atol=2e-4)

    # the MCQ similarity row (sim_matrix == reference model/metric.py:363-375)
    from helping_hand_for_egocentric_videos_tpu.metrics.sim import sim_matrix

    got_sim = np.asarray(sim_matrix(jnp.asarray(got_text), jnp.asarray(got_vids)))
    t_n = torch.from_numpy(want_text) / torch.from_numpy(want_text).norm(dim=-1, keepdim=True)
    v_n = torch.from_numpy(want_vids) / torch.from_numpy(want_vids).norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(got_sim, (t_n @ v_n.T).numpy(), rtol=1e-4, atol=2e-4)


def test_pretrain_loss_end_to_end_parity(rng):
    """The INTEGRATED training loss vs the reference loop math
    (run/train.py:120-192): EgoNCE on the text/video embeds + Hungarian
    hand/obj box losses (SetCriterion weights 5/2, the /(len/3) quirk) +
    0.5 x word contrastive — computed on identical backbone features and
    converted decoder weights. Catches glue the per-loss oracles cannot:
    EOT lookup, query splits, per-frame flattening order, pad-row mask,
    loss weights and the total sum."""
    from model.box_utils import SetCriterion, build_matcher
    from model.box_utils import compute_box_loss as ref_compute_box_loss

    from helping_hand_for_egocentric_videos_tpu.train.step import (
        TrainConfig,
        pretrain_loss_and_metrics,
    )

    b, r, nq_arg = 3, 5, 4  # decoder queries = nq_arg + 1
    dec = _make_ref_decoder(nq_arg + 1, seed=11)
    params = convert_decoder_checkpoint(sd_np(dec), num_layers=2)

    grid = rng.normal(size=(b, T, 4, WIDTH)).astype(np.float32)
    text_fmap = (rng.normal(size=(b * r, 12, 768)) * 0.1).astype(np.float32)
    tokens = rand_tokens(rng, b * r)
    tokens[3, 3:] = 0  # a "padded" rephrase row: exactly [SOT, EOT] nonzero
    tokens[3, 1] = 63
    tokens[3, 2:] = 0
    noun_vec = (rng.random((b, 582)) < 0.05).astype(np.float32)
    verb_vec = (rng.random((b, 118)) < 0.1).astype(np.float32)
    boxes = (rng.random((b, T, 4, 4)) * 150).astype(np.float32) + np.array(
        [0, 0, 60, 60], np.float32
    )
    boxes[0, 0, 1] = 0.0  # a degenerate (empty) box slot
    nouns = rng.integers(0, 20, size=(b, 4)).astype(np.int64)
    noun_dict = (rng.normal(size=(20, 768)) * 0.1).astype(np.float32)

    # ---- reference side (run/train.py:120-192)
    from model.loss import EgoNCE, WordContrastiveLoss
    from model.metric import sim_matrix as ref_sim

    with torch.no_grad():
        model_out, hs, _, _ = dec(torch.from_numpy(grid))
        tk = torch.from_numpy(tokens)
        text_embeds = dec.txt_proj(
            torch.from_numpy(text_fmap)[torch.arange(b * r), tk.argmax(-1)]
        )
        video_embeds = dec.obj_proj(hs[-1])[:, -1]
        sim = ref_sim(text_embeds, video_embeds)
        sim_v = ref_sim(torch.from_numpy(verb_vec), torch.from_numpy(verb_vec))
        sim_n = ref_sim(torch.from_numpy(noun_vec), torch.from_numpy(noun_vec))
        pad = ((tk != 0).sum(-1) != 2).float()[:, None].repeat(1, b)
        nce_t, _ = EgoNCE()(sim, sim_v, sim_n, multi_pad_mask=pad, strict_mask=True)

        criterion = SetCriterion(
            22047,
            matcher=build_matcher(None),
            weight_dict={
                "loss_bbox_hand_boxes": 5,
                "loss_bbox_obj_boxes": 5,
                "loss_giou_hand_boxes": 2,
                "loss_giou_obj_boxes": 2,
            },
            eos_coef=0.1,
            losses=["boxes", "cardinality"],
        )
        image_size = torch.full((b * T, 2), 224.0)
        box_t = 0.0
        for name, fam in (("hand_boxes", boxes[:, :, :2]), ("obj_boxes", boxes[:, :, 2:])):
            tb = torch.from_numpy(fam.reshape(b * T, -1, 4).copy())
            # explicit classes == prepare_targets' None branch without its
            # .cuda() call (box_utils.py:252-255; no GPU in this env)
            classes = torch.stack([1 - (bx.sum(-1) != 0).float() for bx in tb])
            fam_loss, _ = ref_compute_box_loss(
                name, criterion, model_out, tb, classes, image_size, n_queries=nq_arg
            )
            box_t = box_t + fam_loss
        noun_embeds = dec.txt_proj(torch.from_numpy(noun_dict))
        pred_noun = dec.obj_proj(hs[-1])[:, :-1]
        word_t = WordContrastiveLoss()(noun_embeds, pred_noun, torch.from_numpy(nouns))
        total_t = float(nce_t + box_t + 0.5 * word_t)

    # ---- this framework
    cfg = TrainConfig(num_queries=nq_arg, rephrase_factor=r)
    total_j, metrics = pretrain_loss_and_metrics(
        params,
        _my_dec_cfg(nq_arg + 1),
        cfg,
        jnp.asarray(grid),
        jnp.asarray(text_fmap),
        jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray(noun_vec),
        jnp.asarray(verb_vec),
        jnp.asarray(boxes),
        jnp.asarray(nouns.astype(np.int32)),
        jnp.asarray(noun_dict),
    )
    np.testing.assert_allclose(float(metrics["nce_loss"]), float(nce_t), rtol=1e-4)
    np.testing.assert_allclose(float(metrics["box_loss"]), float(box_t), rtol=1e-4)
    np.testing.assert_allclose(float(metrics["word_loss"]), float(word_t), rtol=1e-4)
    np.testing.assert_allclose(float(total_j), total_t, rtol=1e-4)


def test_training_dynamics_parity(rng):
    """Multi-step OPTIMIZER-TRAJECTORY oracle vs the reference recipe
    (VERDICT r2 item 1): identical init (via the converters) and identical
    data, 6 full steps of [composite loss -> backward -> AdamW] on both
    sides — torch AdamW over the optim_policy param groups
    (utils/train_utils.py:28-48, run/train.py:519-520; GradScaler dropped,
    f32 both sides) vs make_optimizer + pretrain_loss_and_metrics. Asserts
    the per-step loss trajectory and the final decoder params match.

    The backbone is frozen (its features are constants of the trajectory),
    so both sides consume the same precomputed feature arrays — this
    isolates exactly the link no other oracle covers: gradients through
    the matched losses and the optimizer update rule (eps/betas/decoupled
    wd order/no-decay policy/grad-None skip semantics).
    """
    import optax

    from model.box_utils import SetCriterion, build_matcher
    from model.box_utils import compute_box_loss as ref_compute_box_loss
    from model.loss import EgoNCE, WordContrastiveLoss
    from model.metric import sim_matrix as ref_sim
    from utils.train_utils import optim_policy

    from helping_hand_for_egocentric_videos_tpu.train import make_optimizer
    from helping_hand_for_egocentric_videos_tpu.train.step import (
        TrainConfig,
        pretrain_loss_and_metrics,
    )

    b, r, nq_arg, n_steps = 3, 5, 4, 6
    # lr big enough that a beta/eps divergence shows in 6 steps; wd HUGE so
    # a wrong decay policy (decayed bias / decayed grad-None param / wrong
    # decoupling order) moves params ~0.3%/step — far above the f32-noise
    # random walk that adam's normalized update produces on near-zero-grad
    # elements (measured <= ~1e-4 over 6 steps at this lr)
    lr, wd = 1e-3, 0.5
    dec = _make_ref_decoder(nq_arg + 1, seed=21)
    dec.eval()  # dropout off; gradients still flow
    # deep-copy: sd_np leaves are views of the torch storage, and opt_t
    # below updates the torch params IN PLACE — without the copy this
    # tree would silently track the reference trajectory
    params = jax.tree.map(
        np.array, convert_decoder_checkpoint(sd_np(dec), num_layers=2)
    )

    grid = rng.normal(size=(b, T, 4, WIDTH)).astype(np.float32)
    text_fmap = (rng.normal(size=(b * r, 12, 768)) * 0.1).astype(np.float32)
    tokens = rand_tokens(rng, b * r)
    tokens[3, 1] = 63
    tokens[3, 2:] = 0  # one padded rephrase row
    noun_vec = (rng.random((b, 582)) < 0.05).astype(np.float32)
    verb_vec = (rng.random((b, 118)) < 0.1).astype(np.float32)
    boxes = (rng.random((b, T, 4, 4)) * 150).astype(np.float32) + np.array(
        [0, 0, 60, 60], np.float32
    )
    nouns = rng.integers(0, 20, size=(b, 4)).astype(np.int64)
    noun_dict = (rng.normal(size=(20, 768)) * 0.1).astype(np.float32)

    # ---- reference trajectory: optim_policy groups + torch AdamW defaults
    backbone_stub = torch.nn.Linear(2, 2)  # optim_policy only freezes it
    opt_t = torch.optim.AdamW(optim_policy(backbone_stub, dec, lr, wd), lr=lr, weight_decay=wd)
    criterion = SetCriterion(
        22047,
        matcher=build_matcher(None),
        weight_dict={
            "loss_bbox_hand_boxes": 5,
            "loss_bbox_obj_boxes": 5,
            "loss_giou_hand_boxes": 2,
            "loss_giou_obj_boxes": 2,
        },
        eos_coef=0.1,
        losses=["boxes", "cardinality"],
    )
    image_size = torch.full((b * T, 2), 224.0)
    tk = torch.from_numpy(tokens)
    sim_v = ref_sim(torch.from_numpy(verb_vec), torch.from_numpy(verb_vec))
    sim_n = ref_sim(torch.from_numpy(noun_vec), torch.from_numpy(noun_vec))
    pad = ((tk != 0).sum(-1) != 2).float()[:, None].repeat(1, b)

    def ref_total_loss():
        model_out, hs, _, _ = dec(torch.from_numpy(grid))
        text_embeds = dec.txt_proj(
            torch.from_numpy(text_fmap)[torch.arange(b * r), tk.argmax(-1)]
        )
        video_embeds = dec.obj_proj(hs[-1])[:, -1]
        sim = ref_sim(text_embeds, video_embeds)
        nce_t, _ = EgoNCE()(sim, sim_v, sim_n, multi_pad_mask=pad, strict_mask=True)
        box_t = 0.0
        for name, fam in (("hand_boxes", boxes[:, :, :2]), ("obj_boxes", boxes[:, :, 2:])):
            tb = torch.from_numpy(fam.reshape(b * T, -1, 4).copy())
            classes = torch.stack([1 - (bx.sum(-1) != 0).float() for bx in tb])
            fam_loss, _ = ref_compute_box_loss(
                name, criterion, model_out, tb, classes, image_size, n_queries=nq_arg
            )
            box_t = box_t + fam_loss
        noun_embeds = dec.txt_proj(torch.from_numpy(noun_dict))
        pred_noun = dec.obj_proj(hs[-1])[:, :-1]
        word_t = WordContrastiveLoss()(noun_embeds, pred_noun, torch.from_numpy(nouns))
        return nce_t + box_t + 0.5 * word_t

    ref_losses = []
    for _ in range(n_steps):
        opt_t.zero_grad()
        total = ref_total_loss()
        total.backward()
        opt_t.step()
        ref_losses.append(float(total))

    # ---- this framework's trajectory
    cfg = TrainConfig(lr=lr, wd=wd, num_queries=nq_arg, rephrase_factor=r)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    args = (
        jnp.asarray(grid),
        jnp.asarray(text_fmap),
        jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray(noun_vec),
        jnp.asarray(verb_vec),
        jnp.asarray(boxes),
        jnp.asarray(nouns.astype(np.int32)),
        jnp.asarray(noun_dict),
    )

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            total, metrics = pretrain_loss_and_metrics(p, _my_dec_cfg(nq_arg + 1), cfg, *args)
            return total, metrics

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    my_losses = []
    for _ in range(n_steps):
        params, opt_state, total = step(params, opt_state)
        my_losses.append(float(total))

    np.testing.assert_allclose(my_losses, ref_losses, rtol=1e-4)
    assert ref_losses[-1] < ref_losses[0]  # both actually trained

    # final params match leaf-by-leaf — incl. class_embed/vid_proj staying
    # EXACTLY at init (torch skips grad-None params: no update, no decay)
    final_t = convert_decoder_checkpoint(sd_np(dec), num_layers=2)
    flat_mine = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_ref = jax.tree.leaves(final_t)
    assert len(flat_mine) == len(flat_ref)
    for (path, mine), ref in zip(flat_mine, flat_ref):
        keystr = jax.tree_util.keystr(path)
        if "wk" in keystr and keystr.endswith("['b']"):
            # attention key-projection biases have an EXACTLY-zero gradient
            # (softmax shift invariance: a bias added to every key shifts
            # all logits of a row equally), so both frameworks random-walk
            # them by adam-normalized f32 noise — only the envelope is
            # comparable: |step| <= lr per step on each side
            atol = 2.0 * n_steps * lr
        elif keystr.endswith("['b']"):
            # bias grads are small batch-sums: adam normalization amplifies
            # f32 noise on them harder than on weights (measured ~3e-4
            # over 6 steps). The exact update rule incl. the bias no-decay
            # mask is pinned by test_adamw_update_rule_parity instead.
            atol = 1e-3 if jax.default_backend() == "cpu" else 4e-3
        else:
            # adam's normalized step amplifies f32 noise on near-zero-grad
            # elements to ~1e-4 over 6 steps (on a TPU backend the larger
            # jax-vs-torch reduction-order gap reaches ~2e-3 on a few
            # attention-k elements whose exact grads are ~0); systematic
            # wd/beta/eps divergences accumulate to >= 1e-2 at wd=0.5
            atol = 2e-4 if jax.default_backend() == "cpu" else 4e-3
        np.testing.assert_allclose(
            np.asarray(mine), np.asarray(ref), rtol=2e-4, atol=atol,
            err_msg=keystr,
        )


def test_adamw_update_rule_parity(rng):
    """The optimizer UPDATE RULE in isolation: identical synthetic
    gradients fed to torch.optim.AdamW over the reference optim_policy
    groups (utils/train_utils.py:28-48, run/train.py:519-520) and to
    make_optimizer for 10 steps. No forward pass -> no f32 chaos, so this
    pins eps/betas placement, decoupled-wd order, the bias no-decay mask,
    bias correction across steps, and the grad-None skip semantics
    (class_embed/vid_proj stay EXACTLY at init on both sides) to ~1e-6.
    """
    import optax

    from utils.train_utils import optim_policy

    from helping_hand_for_egocentric_videos_tpu.train import make_optimizer
    from helping_hand_for_egocentric_videos_tpu.train.step import TrainConfig

    n_steps, lr, wd = 10, 1e-2, 0.1
    dec = _make_ref_decoder(5, seed=31)
    params = jax.tree.map(
        np.array, convert_decoder_checkpoint(sd_np(dec), num_layers=2)
    )

    opt_t = torch.optim.AdamW(
        optim_policy(torch.nn.Linear(2, 2), dec, lr, wd), lr=lr, weight_decay=wd
    )

    # deterministic per-param gradients; class_embed/vid_proj get NO grad
    # (their .grad stays None — the reference loss never touches them)
    g = torch.Generator().manual_seed(99)
    grads_named = {}
    grads_sd = {}
    for name, p in dec.state_dict().items():
        t = torch.randn(p.shape, generator=g) * 0.05
        if name.startswith(("class_embed", "vid_proj")):
            grads_sd[name] = np.zeros(p.shape, np.float32)
        else:
            grads_named[name] = t
            grads_sd[name] = t.numpy()

    for _ in range(n_steps):
        for name, p in dec.named_parameters():
            if name in grads_named:
                p.grad = grads_named[name].clone()
        opt_t.step()

    # the converter is a pure element rearrangement (transpose/split/stack),
    # so it maps a gradient state-dict into this framework's layout exactly
    grads_j = convert_decoder_checkpoint(grads_sd, num_layers=2)
    optimizer = make_optimizer(TrainConfig(lr=lr, wd=wd))
    opt_state = optimizer.init(params)
    for _ in range(n_steps):
        updates, opt_state = optimizer.update(grads_j, opt_state, params)
        params = optax.apply_updates(params, updates)

    # grad-None params must sit EXACTLY at init (no update, no decay)
    init = jax.tree.map(np.array, convert_decoder_checkpoint(sd_np(dec), num_layers=2))
    for key in ("class_embed", "vid_proj"):
        for a, b in zip(jax.tree.leaves(params[key]), jax.tree.leaves(init[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=key)

    final_t = convert_decoder_checkpoint(sd_np(dec), num_layers=2)
    flat_mine = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_ref = jax.tree.leaves(final_t)
    assert len(flat_mine) == len(flat_ref)
    # TPU f32 rsqrt/divide rounding drifts ~1e-5 over 10 steps at this
    # lr; any rule divergence (wd order/mask/eps/betas) shows at >= 1e-3
    atol = 1e-6 if jax.default_backend() == "cpu" else 5e-5
    for (path, mine), ref in zip(flat_mine, flat_ref):
        np.testing.assert_allclose(
            np.asarray(mine), np.asarray(ref), rtol=1e-5, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def test_tokenizer_parity():
    """ClipTokenizer vs the reference SimpleTokenizer (model/tokenizer.py:
    75-162) token-for-token on realistic narrations (ftfy stubbed as
    identity — inputs are clean ASCII, which is what EgoClip captions are)."""
    from model.tokenizer import SimpleTokenizer

    from helping_hand_for_egocentric_videos_tpu.data.tokenizer import ClipTokenizer

    ref = SimpleTokenizer()
    mine = ClipTokenizer()
    texts = [
        "#C C opens a drawer",
        "the person cuts an onion with a knife.",
        "Take  the PLATE, wash it!",
        "a",
        "",
        "x " * 100,  # longer than the context -> truncation path
    ]
    want = ref(texts).numpy()
    got = np.asarray(mine(texts))
    np.testing.assert_array_equal(got, want)


def test_retrieval_metrics_parity(rng):
    """Rank computation of t2v/v2t and egomcq accuracy vs the reference
    (model/metric.py:11-225) on random similarity matrices, incl. the
    tie-breaking and type->[Intra, Inter] mapping quirks.

    Upstream bug: the reference's t2v/v2t_metrics call ``cols2metrics``,
    which is never defined anywhere in the repo — they crash as shipped
    (dead code; no entry point uses them). The rank COLUMNS (the quirky
    averaged-tie logic) are still executable, so we capture those and
    compare against this framework's ranks via a shared final formula."""
    from model import metric as ref_metric

    from helping_hand_for_egocentric_videos_tpu.metrics.retrieval import (
        cols2metrics,
        egomcq_accuracy_metrics,
        t2v_metrics,
        v2t_metrics,
    )

    sims = rng.normal(size=(20, 20)).astype(np.float64)
    sims[3] = sims[7]  # exact tie rows exercise the tie-break path
    ref_metric.cols2metrics = lambda cols, nq: (np.asarray(cols), nq)
    try:
        ref_cols_t, nq_t = ref_metric.t2v_metrics(sims.copy())
        ref_cols_v, nq_v = ref_metric.v2t_metrics(sims.copy())
    finally:
        del ref_metric.cols2metrics
    want_t = cols2metrics(ref_cols_t, nq_t)
    got_t = t2v_metrics(sims)
    for k in ("R1", "R5", "R10", "MedR", "MeanR"):
        np.testing.assert_allclose(got_t[k], want_t[k], rtol=1e-9, err_msg=f"t2v {k}")
    want_v = cols2metrics(ref_cols_v, nq_v)
    got_v = v2t_metrics(sims)
    for k in ("R1", "R5", "R10", "MedR", "MeanR"):
        np.testing.assert_allclose(got_v[k], want_v[k], rtol=1e-9, err_msg=f"v2t {k}")

    preds = rng.normal(size=(30, 5)).astype(np.float32)
    gts = rng.integers(0, 5, 30).astype(np.int64)
    types = rng.integers(1, 3, 30).astype(np.int64)
    want_e = ref_metric.egomcq_accuracy_metrics(
        torch.from_numpy(preds), torch.from_numpy(gts), torch.from_numpy(types)
    )
    got_e = egomcq_accuracy_metrics(preds, gts, types)
    for k in ("Intra-video", "Inter-video"):
        np.testing.assert_allclose(got_e[k], want_e[k], rtol=1e-6, err_msg=k)


def test_ndcg_map_tv_accuracy_parity(rng):
    """calculate_nDCG / calculate_mAP (utils/nDCG.py, utils/mAP.py) and
    compute_tv_accuracy (model/metric.py:378-392) vs the reference on
    random similarity/relevancy matrices."""
    import sys

    sys.path.insert(0, REFERENCE + "/utils")  # nDCG imports as 'from utils import nDCG'
    from model import metric as ref_metric
    from utils import mAP as ref_mAP
    from utils import nDCG as ref_nDCG

    from helping_hand_for_egocentric_videos_tpu.metrics.map import calculate_mAP
    from helping_hand_for_egocentric_videos_tpu.metrics.ndcg import (
        calculate_IDCG,
        calculate_k_counts,
        calculate_nDCG,
    )
    from helping_hand_for_egocentric_videos_tpu.metrics.sim import (
        compute_tv_accuracy,
        sim_matrix,
    )

    sims = rng.random((12, 18)).astype(np.float64)
    rel = (rng.random((12, 18)) < 0.3).astype(np.float64) * rng.random((12, 18))

    kc_ref = ref_nDCG.calculate_k_counts(rel)
    kc = calculate_k_counts(rel)
    np.testing.assert_array_equal(kc, kc_ref)
    idcg_ref = ref_nDCG.calculate_IDCG(rel, kc_ref)
    idcg = calculate_IDCG(rel, kc)
    np.testing.assert_allclose(idcg, idcg_ref, rtol=1e-12)
    np.testing.assert_allclose(
        calculate_nDCG(sims, rel, kc, IDCG=idcg),
        ref_nDCG.calculate_nDCG(sims, rel, kc_ref, IDCG=idcg_ref),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        calculate_mAP(sims, rel), ref_mAP.calculate_mAP(sims, rel), rtol=1e-12
    )

    # train-time top-1 accuracy with the EgoNCE-style positive mask
    n, r, e = 6, 5, 16
    text_embeds = rng.normal(size=(n * r, e)).astype(np.float32)
    sim = rng.normal(size=(n, n)).astype(np.float32)  # primary-caption sims
    sim_v = (rng.random((n, n)) < 0.4).astype(np.float32)
    sim_n = (rng.random((n, n)) < 0.4).astype(np.float32)
    want_vt, want_tv = ref_metric.compute_tv_accuracy(
        torch.from_numpy(sim),
        torch.from_numpy(text_embeds),
        torch.from_numpy(sim_v),
        torch.from_numpy(sim_n),
        n,
        "cpu",
    )
    got_vt, got_tv = compute_tv_accuracy(
        jnp.asarray(sim), jnp.asarray(text_embeds), jnp.asarray(sim_v),
        jnp.asarray(sim_n), n, rephrase_factor=r,
    )
    np.testing.assert_allclose(float(got_vt), float(want_vt), rtol=1e-6)
    np.testing.assert_allclose(float(got_tv), float(want_tv), rtol=1e-6)


def test_box_ops_parity(rng):
    """GIoU (incl. the reference's +1e-4 IoU denominator quirk), format
    conversions and crop_boxes vs utils/box_ops.py.

    crop_boxes upstream mixes axes in its clamp bounds (x2_max = y1 + w,
    box_ops.py:122-125) — visible only for offset crops of a feature that
    is off by default; the oracle covers the zero-offset crop + resize
    path where both implementations define the same math."""
    from utils import box_ops as ref_box_ops

    from helping_hand_for_egocentric_videos_tpu.data.box_crop import (
        apply_crop_to_boxes,
    )
    from helping_hand_for_egocentric_videos_tpu.ops.boxes import (
        box_cxcywh_to_xyxy,
        box_xyxy_to_cxcywh,
        generalized_box_iou,
    )

    n, m = 7, 5
    b1 = rng.random((n, 4)).astype(np.float32)
    b1 = np.concatenate([b1[:, :2], b1[:, :2] + b1[:, 2:] * 0.5 + 0.01], axis=1)
    b2 = rng.random((m, 4)).astype(np.float32)
    b2 = np.concatenate([b2[:, :2], b2[:, :2] + b2[:, 2:] * 0.5 + 0.01], axis=1)

    want = ref_box_ops.generalized_box_iou(
        torch.from_numpy(b1), torch.from_numpy(b2)
    ).numpy()
    got = np.asarray(generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    cxcywh = rng.random((6, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(box_cxcywh_to_xyxy(jnp.asarray(cxcywh))),
        ref_box_ops.box_cxcywh_to_xyxy(torch.from_numpy(cxcywh)).numpy(),
        rtol=1e-6,
    )
    xyxy = np.sort(rng.random((6, 4)).astype(np.float32), axis=-1)
    np.testing.assert_allclose(
        np.asarray(box_xyxy_to_cxcywh(jnp.asarray(xyxy))),
        ref_box_ops.box_xyxy_to_cxcywh(torch.from_numpy(xyxy)).numpy(),
        rtol=1e-6,
    )

    boxes = (rng.random((4, 4)) * 200).astype(np.float32)
    crop = np.array([0, 0, 128, 160], np.float32)  # y1, x1, h, w
    want_c = ref_box_ops.crop_boxes(
        torch.from_numpy(boxes.copy()), torch.from_numpy(crop), resize_target=224
    ).numpy()
    got_c = apply_crop_to_boxes(boxes.copy(), crop, resize_target=224)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-5)


def _import_ref_egoclip():
    """Import the reference EgoClip dataset class with decode-stack stubs
    (av/decord/ffmpeg/iopath and torchvision video transforms are only
    touched by the video path, not the metadata logic under test)."""
    import torch.nn as nn

    for name in ("av", "decord", "ffmpeg"):
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
    if "decord" in sys.modules and not hasattr(sys.modules["decord"], "bridge"):
        sys.modules["decord"].bridge = types.SimpleNamespace(set_bridge=lambda *_: None)
    if "iopath" not in sys.modules:
        iopath = _stub_module("iopath")
        common = _stub_module("iopath.common")
        fio = _stub_module("iopath.common.file_io")
        fio.g_pathmgr = types.SimpleNamespace(open=open)
        common.file_io = fio
        iopath.common = common
        sys.modules["iopath"] = iopath
        sys.modules["iopath.common"] = common
        sys.modules["iopath.common.file_io"] = fio
    tv = sys.modules["torchvision"]
    if not hasattr(tv.transforms, "_transforms_video"):
        tvv = _stub_module("torchvision.transforms._transforms_video")
        for cls in ("RandomResizedCropVideo", "NormalizeVideo", "RandomHorizontalFlipVideo", "CenterCropVideo"):
            setattr(tvv, cls, type(cls, (nn.Module,), {}))
        tv.transforms._transforms_video = tvv
        sys.modules["torchvision.transforms._transforms_video"] = tvv
    if not hasattr(tv.transforms, "functional"):
        tvf = _stub_module("torchvision.transforms.functional")
        tv.transforms.functional = tvf
        sys.modules["torchvision.transforms.functional"] = tvf
    if not hasattr(tv.transforms, "Compose"):
        pass  # already stubbed in _install_stubs

    from data_loader.EgoClip_EgoMCQ_dataset import EgoClip_EgoMCQ

    return EgoClip_EgoMCQ


def test_egoclip_noun_extraction_and_rephrased_parity(rng):
    """The EgoClip metadata quirks vs the reference class methods
    (EgoClip_EgoMCQ_dataset.py:172-243): noun extraction (two-word-first
    matching, plural stripping, exclude list, index-into-dictionary) and
    the rephrased-caption ±0.5 s lookup with its first-caption-mismatch
    fallback."""
    import pandas as pd

    from helping_hand_for_egocentric_videos_tpu.data.egoclip import EgoClipDataset

    RefDS = _import_ref_egoclip()

    nouns = ["pad", "drawer", "knife", "kitchen knife", "plate", "onion"]
    groups = [["drawer"], ["knife", "kitchen knife"], ["plate"], ["onion"], ["hand"]]
    noun_pd = pd.DataFrame({"group": groups})

    ref = RefDS.__new__(RefDS)
    ref.noun_pd = noun_pd
    ref.all_nouns = nouns

    mine = EgoClipDataset.__new__(EgoClipDataset)
    mine.noun_groups = groups
    mine.all_nouns = nouns

    captions = [
        "#C C opens a drawer with the kitchen knife.",
        "the person puts plates, onions and knives on drawers",
        "a hand holds the knife",  # 'hand' excluded, 'knife' kept
        "nothing relevant here",
        "knife knife knife knife knife drawer",  # repeat + cap at 4
    ]
    for cap in captions:
        sample = {"tag_noun": "[0, 1, 2, 3, 4]"}
        w_ref, arr_ref = RefDS.extract_noun(ref, sample, cap)
        w_my, arr_my = mine._extract_nouns(sample, cap)
        assert w_my == w_ref, (cap, w_my, w_ref)
        np.testing.assert_array_equal(arr_my, arr_ref.numpy().astype(np.int32), err_msg=cap)

    # rephrased ±0.5 s lookup
    reph = {
        "vid": {
            "0": {
                12.3: [["cap at 12.3"], ["r1"], ["r2"], ["r3"], ["r4"]],
                99.9: [["unused"]] * 5,
            }
        }
    }
    ref.rephrased_txts = reph
    mine.rephrased = reph
    for start, cap, want_first in (
        (12.5, "cap at 12.3", "cap at 12.3"),     # within +-0.5 -> match
        (12.5, "different caption", "different caption"),  # mismatch -> fallback
        (50.0, "far away", "far away"),           # no entry -> fallback
    ):
        got = mine._rephrased_caption({"video_uid": "vid"}, start, cap)
        want = RefDS._get_rephrased_caption(ref, {"video_uid": "vid"}, [start], cap)
        assert got == want, (start, cap, got, want)
        assert got[0] == want_first


def test_egoclip_hand_object_boxes_parity(rng, tmp_path):
    """100DOH pickle indexing vs the reference (load_hand_object_box,
    EgoClip_EgoMCQ_dataset.py:79-103 + utils/box_ops.py:93-104): top-2
    detections by score per frame, [hand0, hand1, obj0, obj1] slots, the
    clip_start ±0.001 key retry, and the image-size lookup."""
    import pickle as pkl

    from helping_hand_for_egocentric_videos_tpu.data.egoclip import EgoClipDataset

    RefDS = _import_ref_egoclip()

    def dets(n, seed):
        r = np.random.default_rng(seed)
        d = r.random((n, 5)).astype(np.float32)
        d[:, :4] *= 300
        return d

    per_clip = {"info": {"height": 256, "width": 456}}
    for fi in range(4):
        per_clip[fi] = {
            "hand_dets": dets(3, fi) if fi != 2 else None,  # a frame without hands
            "obj_dets": dets(4, 10 + fi),
        }
    # stored at the -0.001-shifted key: only the retry path finds it
    info = {round(12.3 - 0.001, 3): per_clip}
    vdir = tmp_path / "handobj" / "vid_x"
    vdir.mkdir(parents=True)
    with open(vdir / "0.handobj.pkl", "wb") as f:
        pkl.dump(info, f)

    sample = {"video_uid": "vid_x", "clip_start": 12.3}

    ref = RefDS.__new__(RefDS)
    ref.handobj_dir = str(tmp_path / "handobj")
    ref.chunk_sec = 600
    want_boxes, want_size = RefDS.load_hand_object_box(ref, sample)

    mine = EgoClipDataset.__new__(EgoClipDataset)
    mine.handobj_dir = str(tmp_path / "handobj")
    got_boxes, got_size = mine._load_boxes(sample)

    assert got_size == tuple(want_size)
    np.testing.assert_allclose(got_boxes, want_boxes.numpy(), rtol=1e-6)


def test_build_models_openai_bootstrap_dispatch(tmp_path, rng):
    """train.pretrain.build_models must route stock OpenAI CLIP weights
    (sniffed by 'visual.class_embedding') through the bootstrap converter
    and honour the int8_backbone flag — the reference factory path on
    from-scratch runs (run/train.py:425-431)."""
    import model.openai_model as openai_model

    from helping_hand_for_egocentric_videos_tpu.core.config import ExperimentConfig
    from helping_hand_for_egocentric_videos_tpu.models.weights import (
        convert_openai_clip_checkpoint,
    )
    from helping_hand_for_egocentric_videos_tpu.train.pretrain import build_models

    torch.manual_seed(11)
    clip = openai_model.CLIP(
        embed_dim=16,
        image_resolution=IMG,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=PATCH,
        context_length=12,
        vocab_size=64,
        transformer_width=32,
        transformer_heads=4,
        transformer_layers=2,
    ).float()
    randomize_(clip, 12)
    ckpt = tmp_path / "openai_clip.pth"
    torch.save(clip.state_dict(), str(ckpt))

    cfg = ExperimentConfig()
    cfg.model.backbone = "timesformer_tiny"
    cfg.model.backbone_ckpt = str(ckpt)
    cfg.model.project_embed_dim = 16
    cfg.data.num_frames = T

    _, backbone, _, decoder = build_models(cfg)
    want = convert_openai_clip_checkpoint(
        sd_np(clip), num_frames=T, project_embed_dim=16
    )
    flat_got = jax.tree_util.tree_leaves_with_path(backbone)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_got) == len(flat_want)
    for path, leaf in flat_got:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_want[path]), rtol=1e-6, err_msg=str(path)
        )
    assert decoder is not None  # fresh init (no decoder_ckpt given)

    # int8_backbone=True quantises the converted tower's matmul weights
    cfg.model.int8_backbone = True
    _, backbone_q, _, _ = build_models(cfg)
    dtypes = {
        np.asarray(l).dtype for l in jax.tree_util.tree_leaves(backbone_q)
    }
    assert np.dtype(np.int8) in dtypes


def test_frame_samplers_match_reference_functions():
    """Deterministic sampler paths vs the ACTUAL reference functions
    (base/base_dataset.py:178-245,195-219): uniform, fix_start, the
    exact-window special case, clips midpoints, and jitter-off
    get_frame_ids across a grid of (num_frames, extent)."""
    import base.base_dataset as ref_bd

    from helping_hand_for_egocentric_videos_tpu.data.samplers import (
        get_frame_ids,
        sample_frames,
        sample_frames_clips,
        sample_frames_start_end,
    )

    for nf in (1, 3, 4, 8, 16):
        for vlen in (1, 2, 5, 30, 100, 601):
            assert sample_frames(nf, vlen, sample="uniform") == list(
                ref_bd.sample_frames(nf, vlen, sample="uniform")
            ), (nf, vlen)
            # the reference checks sample=='rand' BEFORE fix_start, so
            # fix_start only takes effect with an explicit non-rand sample
            # (and its rand path crashes on degenerate segments)
            assert sample_frames(nf, vlen, fix_start=1) == list(
                ref_bd.sample_frames(nf, vlen, sample="uniform", fix_start=1)
            ), (nf, vlen)

    for nf in (2, 4, 8):
        for start, end in ((0, 4), (10, 13), (5, 90), (0, 1), (7, 7 + nf - 1)):
            assert sample_frames_start_end(nf, start, end, sample="uniform") == list(
                ref_bd.sample_frames_start_end(nf, start, end, sample="uniform")
            ), (nf, start, end)
            assert sample_frames_start_end(nf, start, end, fix_start=0) == list(
                ref_bd.sample_frames_start_end(
                    nf, start, end, sample="uniform", fix_start=0
                )
            ), (nf, start, end)

    for start, end, vlen, acc in ((0, 100, 80, 4), (-5, 300, 200, 4), (10, 20, 50, 3)):
        assert sample_frames_clips(start, end, vlen, acc) == list(
            ref_bd.sample_frames_clips(start, end, vlen, acc)
        ), (start, end, vlen, acc)

    for start, end, seg in ((0, 120, 4), (30, 90, 16), (0, 2, 4)):
        assert get_frame_ids(start, end, num_segments=seg, jitter=False) == list(
            ref_bd.get_frame_ids(start, end, num_segments=seg, jitter=False)
        ), (start, end, seg)
