"""Headline benchmark: clips/sec/chip at the 16-frame eval configuration.

Measures the flagship eval forward — frozen LaviLa TimeSformer-L backbone
(16 frames, 224^2, bf16, 4097 tokens) + object decoder (num_queries=13,
pred_traj off, matching run/test_epic.py:106-182) — on one TPU chip and
prints ONE JSON line.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md); we normalise against an estimated 30 clips/s for the
reference PyTorch fp16 eval on one A100 (TimeSformer-L @ 16f is ~2.5
TFLOPs/clip; the reference's unfused eager eval with bs=1
(run/test_epic.py:319) is generously assumed to reach that). The driver's
north star is vs_baseline >= 5.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os

REFERENCE_CLIPS_PER_SEC = 30.0
BATCH = 8
FRAMES = 16
STEPS = 5
# HH_BENCH_INT8=1 benchmarks the int8-quantized visual tower (+~22%;
# retrieval parity on real weights pending — see TODO.md)
INT8 = os.environ.get("HH_BENCH_INT8", "0") == "1"


def main():
    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        decoder_forward,
        init_decoder_params,
        init_lavila_params,
        timesformer_large_config,
    )
    from helping_hand_for_egocentric_videos_tpu.models import obj_decoder as dec_mod
    from helping_hand_for_egocentric_videos_tpu.models.lavila import encode_image

    cfg = timesformer_large_config(num_frames=FRAMES)
    dec_cfg = DecoderConfig(num_frames=FRAMES, pred_traj=False)
    key = jax.random.PRNGKey(0)
    backbone = init_lavila_params(key, cfg)
    decoder = init_decoder_params(key, dec_cfg)
    if INT8:
        from helping_hand_for_egocentric_videos_tpu.models.quant import (
            quantize_lavila_params,
        )

        backbone = quantize_lavila_params(backbone)

    n = cfg.visual.patches_per_frame

    @jax.jit
    def eval_forward(backbone, decoder, video):
        _, fmap = encode_image(backbone, cfg, video, use_remat=False, dtype=jnp.bfloat16)
        b = video.shape[0]
        grid = fmap[:, 1:, :].reshape(b, FRAMES, n, -1)
        out = decoder_forward(decoder, dec_cfg, grid)
        video_embed = dec_mod.obj_proj(decoder, out.hs[-1])[:, -1]
        return video_embed, out.pred_boxes

    video = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, FRAMES, 224, 224, 3)).astype(np.float32)
    )

    # warmup/compile; sync via a device->host copy (block_until_ready is
    # not a reliable fence on the experimental axon relay platform)
    np.asarray(eval_forward(backbone, decoder, video)[0])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = eval_forward(backbone, decoder, video)
    np.asarray(out[0])
    dt = time.perf_counter() - t0

    clips_per_sec = BATCH * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "clips_per_sec_per_chip_16f_eval",
                "value": round(clips_per_sec, 3),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / REFERENCE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
