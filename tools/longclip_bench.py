"""Long-clip headroom proof: flagship eval forward at T = 16 / 32 / 64.

Substantiates the SURVEY section-5.7 claim that the block-wise Pallas
attention kernels stay memory-flat for longer clips, and exercises
``_temporal_block``'s nb=8 fallback (divided_attention.py:248-262, hit
once 256 // t < 8, i.e. T > 32) on real hardware.

For each T: init the flagship at 4 frames, inflate the temporal embed
through the real converter path (models/weights.py::inflate_temporal_embed,
the 4 -> 16 inflation of run/test_epic.py:106-133 generalised), jit the
eval forward, and record clips/s, ms/clip, and device peak memory.

Usage (on the TPU box):  python tools/longclip_bench.py [--batch 4]
Prints one JSON line per T plus a summary table line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def peak_mem_gb() -> float | None:
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats["peak_bytes_in_use"] / 1e9, 3)
    except Exception:
        return None


def bench_t(t: int, batch: int, steps: int) -> dict:
    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        decoder_forward,
        init_decoder_params,
        init_lavila_params,
    )
    from helping_hand_for_egocentric_videos_tpu.models import obj_decoder as dec_mod
    from helping_hand_for_egocentric_videos_tpu.models.lavila import (
        encode_image,
        timesformer_large_config,
    )
    from helping_hand_for_egocentric_videos_tpu.models.weights import (
        inflate_temporal_embed,
    )
    from helping_hand_for_egocentric_videos_tpu.utils.flops import (
        eval_fwd_flops_per_clip,
    )

    # init at the release shape (4f) and inflate — the real eval-path
    # conversion, not a convenience re-init
    cfg4 = timesformer_large_config(num_frames=4)
    key = jax.random.PRNGKey(0)
    backbone = init_lavila_params(key, cfg4)
    backbone["visual"]["temporal_embed"] = inflate_temporal_embed(
        backbone["visual"]["temporal_embed"], t
    )
    cfg = timesformer_large_config(num_frames=t)
    dec_cfg = DecoderConfig(num_frames=t, pred_traj=False)
    decoder = init_decoder_params(key, dec_cfg)
    n = cfg.visual.patches_per_frame

    @jax.jit
    def eval_forward(backbone, decoder, video):
        _, fmap = encode_image(backbone, cfg, video, use_remat=False, dtype=jnp.bfloat16)
        b = video.shape[0]
        grid = fmap[:, 1:, :].reshape(b, t, n, -1)
        out = decoder_forward(decoder, dec_cfg, grid)
        return dec_mod.obj_proj(decoder, out.hs[-1])[:, -1], out.pred_boxes

    video = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, t, 224, 224, 3)).astype(np.float32)
    )
    np.asarray(eval_forward(backbone, decoder, video)[0])  # compile + sync

    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = eval_forward(backbone, decoder, video)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    clips_per_sec = batch * steps / dt
    flops = eval_fwd_flops_per_clip(cfg, dec_cfg)
    return {
        "frames": t,
        "batch": batch,
        "clips_per_sec": round(clips_per_sec, 3),
        "ms_per_clip": round(1000.0 / clips_per_sec, 2),
        "tflop_per_clip": round(flops / 1e12, 3),
        "mfu_bf16": round(clips_per_sec * flops / 197e12, 4),
        "peak_mem_gb": peak_mem_gb(),
        "temporal_nb_fallback": bool(256 // t < 8),  # divided_attention.py:262
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--frames", type=int, nargs="*", default=[16, 32, 64])
    args = p.parse_args()
    rows = []
    for t in args.frames:
        row = bench_t(t, args.batch, args.steps)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "longclip_sweep", "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
