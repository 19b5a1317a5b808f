"""PyTorch checkpoint -> JAX pytree converters.

Loads the released weights the reference consumes and maps them onto this
framework's parameter trees:

- LaviLa dual-encoder checkpoints
  (``clip_openai_timesformer_{large,base}...pth``): full CLIP state dict
  with a ``module.`` prefix (stripped like run/train.py:434-437).
- Helping-hands decoder checkpoints (``*.pth.tar`` with a ``state_dict``
  of the ObjDecoder).
- Raw OpenAI CLIP visual towers (the ``remap_keys`` CLIP->TimeSformer
  mapping, model/LaviLa.py:19-53) for building a backbone from scratch.

Layout conventions: our Linear weights are (in, out) = transpose of
torch; the conv patchifier becomes a (P*P*C, D) matmul weight; torch's
packed ``in_proj_weight`` is split into wq/wk/wv.

``inflate_temporal_embed`` reproduces the 4->16-frame bilinear inflation
used at eval (run/test_egtea.py:46-96 via test_epic.py:128-132).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = [
    "load_torch_state_dict",
    "convert_lavila_checkpoint",
    "convert_openai_clip_checkpoint",
    "convert_decoder_checkpoint",
    "inflate_temporal_embed",
]


def load_torch_state_dict(path: str) -> dict:
    """torch.load a checkpoint and return a numpy state dict with the
    ``module.`` prefix stripped and an inner ``state_dict`` unwrapped.

    The official OpenAI CLIP releases are TorchScript archives (the
    reference falls back to torch.jit.load, openai_clip.py:151-160) —
    those load as a ScriptModule whose ``state_dict()`` is taken."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except RuntimeError:
        ckpt = torch.jit.load(path, map_location="cpu")
    if isinstance(ckpt, torch.jit.ScriptModule):
        ckpt = ckpt.state_dict()
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        out[k] = v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def _lin(sd, name):
    p = {"w": jnp.asarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _ln(sd, name):
    return {"g": jnp.asarray(sd[f"{name}.weight"]), "b": jnp.asarray(sd[f"{name}.bias"])}


def _mha(sd, name):
    """torch.nn.MultiheadAttention -> {wq, wk, wv, wo}."""
    w = sd[f"{name}.in_proj_weight"]  # (3D, D)
    b = sd[f"{name}.in_proj_bias"]
    d = w.shape[1]
    wq, wk, wv = w[:d], w[d : 2 * d], w[2 * d :]
    bq, bk, bv = b[:d], b[d : 2 * d], b[2 * d :]
    return {
        "wq": {"w": jnp.asarray(wq.T), "b": jnp.asarray(bq)},
        "wk": {"w": jnp.asarray(wk.T), "b": jnp.asarray(bk)},
        "wv": {"w": jnp.asarray(wv.T), "b": jnp.asarray(bv)},
        "wo": _lin(sd, f"{name}.out_proj"),
    }


def _stack(trees):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def convert_lavila_checkpoint(sd: dict, visual_depth: int = 24, text_layers: int = 12):
    """Full LaviLa CLIP state dict -> our lavila params pytree."""
    conv_w = sd["visual.patch_embed.proj.weight"]  # (D, C, P, P)
    d_out = conv_w.shape[0]
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(-1, d_out)

    vis_blocks = []
    for i in range(visual_depth):
        pre = f"visual.blocks.{i}"
        vis_blocks.append(
            {
                "norm1": _ln(sd, f"{pre}.norm1"),
                "attn": {
                    "qkv": _lin(sd, f"{pre}.attn.qkv"),
                    "proj": _lin(sd, f"{pre}.attn.proj"),
                },
                "norm3": _ln(sd, f"{pre}.norm3"),
                "timeattn": {
                    "qkv": _lin(sd, f"{pre}.timeattn.qkv"),
                    "proj": _lin(sd, f"{pre}.timeattn.proj"),
                },
                "norm2": _ln(sd, f"{pre}.norm2"),
                "mlp_fc1": _lin(sd, f"{pre}.mlp.fc1"),
                "mlp_fc2": _lin(sd, f"{pre}.mlp.fc2"),
            }
        )

    params = {
        "visual": {
            "patch_embed": {"w": jnp.asarray(patch_w)},
            "cls_token": jnp.asarray(sd["visual.cls_token"]),
            "pos_embed": jnp.asarray(sd["visual.pos_embed"]),
            "temporal_embed": jnp.asarray(sd["visual.temporal_embed"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "blocks": _stack(vis_blocks),
            "norm": _ln(sd, "visual.norm"),
        }
    }

    # vision-only checkpoints (e.g. a bare SpaceTimeTransformer) omit the
    # text tower and projections; convert what is present.
    if text_layers and "token_embedding.weight" in sd:
        txt_blocks = []
        for i in range(text_layers):
            pre = f"transformer.resblocks.{i}"
            txt_blocks.append(
                {
                    "ln_1": _ln(sd, f"{pre}.ln_1"),
                    "attn": _mha(sd, f"{pre}.attn"),
                    "ln_2": _ln(sd, f"{pre}.ln_2"),
                    "mlp_fc": _lin(sd, f"{pre}.mlp.c_fc"),
                    "mlp_proj": _lin(sd, f"{pre}.mlp.c_proj"),
                }
            )
        params["text"] = {
            "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
            "positional_embedding": jnp.asarray(sd["positional_embedding"]),
            "blocks": _stack(txt_blocks),
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": jnp.asarray(sd["text_projection"]),
        }
    if "image_projection" in sd:
        params["image_projection"] = jnp.asarray(sd["image_projection"])
    if "logit_scale" in sd:
        params["logit_scale"] = jnp.asarray(sd["logit_scale"])
    return params


def convert_openai_clip_checkpoint(
    sd: dict, num_frames: int = 4, project_embed_dim: int = 256, seed: int = 0
):
    """Raw OpenAI CLIP state dict -> our lavila params (TimeSformer inflation).

    The from-scratch bootstrap the reference factory performs on every run
    (run/train.py:425-431): ``remap_keys`` maps the CLIP ViT onto the
    TimeSformer's spatial weights (model/LaviLa.py:19-53) and the temporal
    pieces get the ``time_init='zeros'`` init (qkv zeroed, proj weight 1 —
    L:236-242, so time attention starts as identity residual); the text
    tower loads verbatim (L:161-164). Projections are taken from CLIP only
    when their output dim equals ``project_embed_dim``; otherwise they are
    freshly initialised with CLIP's init scheme (L:165-171, 637-640).

    Args:
        sd: numpy state dict with OpenAI CLIP keys (``visual.conv1.weight``,
            ``visual.transformer.resblocks.*``, ``transformer.resblocks.*``,
            ...), e.g. from ``load_torch_state_dict`` on a stock ViT-L/14.
    """
    depth = 1 + max(
        int(k.split(".")[3])
        for k in sd
        if k.startswith("visual.transformer.resblocks.")
    )
    text_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
    )
    width = sd["visual.class_embedding"].shape[-1]

    out = {
        "visual.patch_embed.proj.weight": sd["visual.conv1.weight"],
        "visual.cls_token": sd["visual.class_embedding"].reshape(1, 1, width),
        "visual.pos_embed": sd["visual.positional_embedding"][None],
        "visual.temporal_embed": np.zeros((1, num_frames, width), np.float32),
        "visual.ln_pre.weight": sd["visual.ln_pre.weight"],
        "visual.ln_pre.bias": sd["visual.ln_pre.bias"],
        "visual.norm.weight": sd["visual.ln_post.weight"],
        "visual.norm.bias": sd["visual.ln_post.bias"],
    }
    for i in range(depth):
        src = f"visual.transformer.resblocks.{i}"
        dst = f"visual.blocks.{i}"
        for s, d in (
            ("ln_1", "norm1"),
            ("ln_2", "norm2"),
        ):
            out[f"{dst}.{d}.weight"] = sd[f"{src}.{s}.weight"]
            out[f"{dst}.{d}.bias"] = sd[f"{src}.{s}.bias"]
        out[f"{dst}.attn.qkv.weight"] = sd[f"{src}.attn.in_proj_weight"]
        out[f"{dst}.attn.qkv.bias"] = sd[f"{src}.attn.in_proj_bias"]
        out[f"{dst}.attn.proj.weight"] = sd[f"{src}.attn.out_proj.weight"]
        out[f"{dst}.attn.proj.bias"] = sd[f"{src}.attn.out_proj.bias"]
        out[f"{dst}.mlp.fc1.weight"] = sd[f"{src}.mlp.c_fc.weight"]
        out[f"{dst}.mlp.fc1.bias"] = sd[f"{src}.mlp.c_fc.bias"]
        out[f"{dst}.mlp.fc2.weight"] = sd[f"{src}.mlp.c_proj.weight"]
        out[f"{dst}.mlp.fc2.bias"] = sd[f"{src}.mlp.c_proj.bias"]
        # time_init='zeros': identity time-attention residual at start
        out[f"{dst}.norm3.weight"] = np.ones(width, np.float32)
        out[f"{dst}.norm3.bias"] = np.zeros(width, np.float32)
        out[f"{dst}.timeattn.qkv.weight"] = np.zeros((3 * width, width), np.float32)
        out[f"{dst}.timeattn.qkv.bias"] = np.zeros(3 * width, np.float32)
        out[f"{dst}.timeattn.proj.weight"] = np.ones((width, width), np.float32)
        out[f"{dst}.timeattn.proj.bias"] = np.zeros(width, np.float32)

    # text tower key names coincide with the LaviLa checkpoint layout
    for k in sd:
        if k.startswith(("transformer.", "token_embedding", "ln_final")) or k in (
            "positional_embedding",
            "logit_scale",
        ):
            out[k] = sd[k]

    rng = np.random.default_rng(seed)
    vis_proj = sd.get("visual.proj")
    if vis_proj is not None and vis_proj.shape[1] == project_embed_dim:
        out["image_projection"] = vis_proj
    else:
        out["image_projection"] = (
            rng.standard_normal((width, project_embed_dim)).astype(np.float32)
            * width**-0.5
        )
    txt_proj = sd.get("text_projection")
    if txt_proj is not None and txt_proj.shape[1] != project_embed_dim:
        tw = txt_proj.shape[0]
        txt_proj = (
            rng.standard_normal((tw, project_embed_dim)).astype(np.float32)
            * tw**-0.5
        )
    if txt_proj is not None:
        out["text_projection"] = txt_proj

    return convert_lavila_checkpoint(out, visual_depth=depth, text_layers=text_layers)


def convert_decoder_checkpoint(sd: dict, num_layers: int = 6):
    """Helping-hands ObjDecoder state dict -> our decoder params pytree."""
    layers = []
    for i in range(num_layers):
        pre = f"transformer.decoder.layers.{i}"
        layers.append(
            {
                "norm1": _ln(sd, f"{pre}.norm1"),
                "self_attn": _mha(sd, f"{pre}.self_attn"),
                "norm2": _ln(sd, f"{pre}.norm2"),
                "cross_attn": _mha(sd, f"{pre}.multihead_attn"),
                "norm3": _ln(sd, f"{pre}.norm3"),
                "linear1": _lin(sd, f"{pre}.linear1"),
                "linear2": _lin(sd, f"{pre}.linear2"),
            }
        )

    params = {
        "pre_norm": _ln(sd, "transformer.pre_norm"),
        "layers": _stack(layers),
        "decoder_norm": _ln(sd, "transformer.decoder.norm"),
        "query_embed": jnp.asarray(sd["query_embed.weight"]),
        "class_embed": _lin(sd, "class_embed"),
        "bbox_mlp": [
            _lin(sd, "bbox_embed.layers.0"),
            _lin(sd, "bbox_embed.layers.1"),
            _lin(sd, "bbox_embed.layers.2"),
        ],
        "proj": {"w": jnp.asarray(sd["proj.weight"].T)},
        "pos_embed": jnp.asarray(sd["pos_embed"]),
        "temporal_embed": jnp.asarray(sd["temporal_embed"]),
        "txt_proj": _lin(sd, "txt_proj.1"),
        "vid_proj": _lin(sd, "vid_proj.0"),
        "obj_proj": [_lin(sd, "obj_proj.0"), _lin(sd, "obj_proj.2")],
    }
    if "frame_index.weight" in sd:
        params["frame_index"] = jnp.asarray(sd["frame_index.weight"])
        params["frame_proj"] = _lin(sd, "frame_proj")
    if "query_index.weight" in sd:
        params["query_index"] = jnp.asarray(sd["query_index.weight"])
    return params


def inflate_temporal_embed(temporal_embed, num_frames: int):
    """Bilinearly resample a (1, T0, D) temporal embedding to T frames.

    Matches the reference's F.interpolate(mode='bilinear') inflation
    (run/test_egtea.py:74-88).
    """
    import jax

    te = jnp.asarray(temporal_embed)
    t0 = te.shape[1]
    if t0 == num_frames:
        return te
    if t0 > num_frames:
        # more loaded frames than needed -> slice (run/test_egtea.py:66-68)
        return te[:, :num_frames]
    # torch bilinear on a (1, 1, T, D) image with align_corners=False
    resized = jax.image.resize(
        te[0], (num_frames, te.shape[2]), method="linear"
    )
    return resized[None]
