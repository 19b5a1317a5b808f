"""Torch checkpoint FILE loading: the exact release formats.

Saves synthetic .pth/.pth.tar files in the released layouts (inner
'state_dict', 'module.' prefixes, epoch/iteration metadata — matching
run/train.py:433-437 and the decoder checkpoints at run/train.py:232-237)
and loads them through the full converter path.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from test_weights import make_decoder_sd, make_lavila_sd

from helping_hand_for_egocentric_videos_tpu.models import DecoderConfig, decoder_forward
from helping_hand_for_egocentric_videos_tpu.models.weights import (
    convert_decoder_checkpoint,
    convert_lavila_checkpoint,
    load_torch_state_dict,
)


def test_lavila_release_format(tmp_path):
    sd = {f"module.{k}": torch.tensor(v) for k, v in make_lavila_sd().items()}
    path = tmp_path / "clip_openai_timesformer_large.fake.pth"
    torch.save({"state_dict": sd, "epoch": 3}, path)

    loaded = load_torch_state_dict(str(path))
    assert "visual.cls_token" in loaded  # module. stripped
    params = convert_lavila_checkpoint(loaded, visual_depth=2, text_layers=2)
    assert params["visual"]["blocks"]["attn"]["qkv"]["w"].shape == (2, 32, 96)
    assert np.isfinite(np.asarray(params["text"]["token_embedding"])).all()


def test_decoder_release_format(tmp_path):
    sd = {k: torch.tensor(v) for k, v in make_decoder_sd().items()}
    path = tmp_path / "runtime.pth.tar"
    torch.save(
        {"state_dict": sd, "epoch": 1, "iteration": 2500, "best_acc": 41.2}, path
    )
    loaded = load_torch_state_dict(str(path))
    params = convert_decoder_checkpoint(loaded, num_layers=2)

    cfg = DecoderConfig(
        d_model=32, nhead=4, num_layers=2, dim_feedforward=64, num_queries=5,
        num_classes=10, feature_dim=48, text_width=24, embed_dim=16,
        num_frames=2, patches_per_frame=4,
    )
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 4, 48)).astype(np.float32))
    out = decoder_forward(params, cfg, feats)
    assert np.isfinite(np.asarray(out.pred_boxes)).all()
