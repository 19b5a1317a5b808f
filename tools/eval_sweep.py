"""Eval batch sweep: flagship 16f eval forward at bs in {8,16,32,64}.

The r5 train sweep found its knee at bs=32 (BENCH_NOTES r5); this
measures whether the EVAL headline (bench.py pins BATCH=16) leaves
throughput on the table at larger batches, for bf16 and (optionally)
int8. Usage on the TPU box: python tools/eval_sweep.py [--int8]
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


def bench(batch: int, steps: int, quantize: bool) -> dict:
    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        decoder_forward,
        init_decoder_params,
        init_lavila_params,
        timesformer_large_config,
    )
    from helping_hand_for_egocentric_videos_tpu.models import obj_decoder as dec_mod
    from helping_hand_for_egocentric_videos_tpu.models.lavila import encode_image
    from helping_hand_for_egocentric_videos_tpu.utils.flops import (
        eval_fwd_flops_per_clip,
    )

    cfg = timesformer_large_config(num_frames=16)
    dec_cfg = DecoderConfig(num_frames=16, pred_traj=False)
    key = jax.random.PRNGKey(0)
    backbone = init_lavila_params(key, cfg)
    decoder = init_decoder_params(key, dec_cfg)
    if quantize:
        from helping_hand_for_egocentric_videos_tpu.models.quant import (
            quantize_lavila_params,
        )

        backbone = quantize_lavila_params(backbone)
    n = cfg.visual.patches_per_frame

    @jax.jit
    def eval_forward(backbone, decoder, video):
        _, fmap = encode_image(backbone, cfg, video, use_remat=False, dtype=jnp.bfloat16)
        b = video.shape[0]
        grid = fmap[:, 1:, :].reshape(b, 16, n, -1)
        out = decoder_forward(decoder, dec_cfg, grid)
        return dec_mod.obj_proj(decoder, out.hs[-1])[:, -1], out.pred_boxes

    video = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 16, 224, 224, 3)).astype(np.float32)
    )
    np.asarray(eval_forward(backbone, decoder, video)[0])  # compile + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = eval_forward(backbone, decoder, video)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    cps = batch * steps / dt
    flops = eval_fwd_flops_per_clip(cfg, dec_cfg)
    peak = 394e12 if quantize else 197e12
    return {
        "metric": "eval_sweep_16f" + ("_int8" if quantize else "_bf16"),
        "batch": batch,
        "clips_per_sec": round(cps, 3),
        "mfu": round(cps * flops / peak, 4),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batches", type=int, nargs="*", default=[8, 16, 32, 64])
    args = p.parse_args()
    for b in args.batches:
        print(json.dumps(bench(b, args.steps, args.int8)), flush=True)


if __name__ == "__main__":
    main()
