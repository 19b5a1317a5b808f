"""One-command on-chip A/B for the fused-denominator rows kernel.

Measures (BENCH_NOTES r4 "Kernel-tail experiment"):
1. attention-only 24-layer chains (spatial + temporal) at ViT-L eval
   shapes, plain vs fused_den — single-dispatch chains per the dev-box
   methodology (per-call loops are polluted ~100x by tunnel dispatch);
2. the full 16-frame eval forward (bf16 and int8) with
   SpaceTimeConfig.fused_den_attention off/on.

Wedge-proof like bench.py: a bounded subprocess device probe runs before
any jit; a dead tunnel yields one structured line and rc=0.

Usage (dev box):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from helping_hand_for_egocentric_videos_tpu.cli.common import (
        bounded_device_probe,
    )

    probe = bounded_device_probe()
    if probe is None:
        print(json.dumps({"metric": "tpu_unavailable", "detail": "probe failed"}))
        return 0
    print(json.dumps({"metric": "device_probe", **probe}), flush=True)

    from helping_hand_for_egocentric_videos_tpu.cli.common import (
        setup_compilation_cache,
    )

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helping_hand_for_egocentric_videos_tpu.ops.divided_attention import (
        divided_patch_attention,
    )

    b, t, n, d, heads = 8, 16, 256, 1024, 16
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(b, t, n, 3 * d)).astype(np.float32) * 0.2,
                      jnp.bfloat16)
    ck, cv, cq = (
        jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.2, jnp.bfloat16)
        for _ in range(3)
    )

    def timed(fn, *args, reps=4):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0], np.float32)  # compile + sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0], np.float32)
        return (time.perf_counter() - t0) / reps

    # the A/B grid: fused_den (softmax-pass experiment) x coalesce_out
    # (epilogue-store experiment) — both promoted only on measured gains
    VARIANTS = {
        "plain": {},
        "fused": {"fused_den": True},
        "coal": {"coalesce_out": True},
        "fused_coal": {"fused_den": True, "coalesce_out": True},
    }

    # on-chip agreement first: interpret-mode tests can't see real Mosaic
    # lowering bugs, so refuse to time a miscompiled kernel
    for mode in ("space", "time"):
        a, _ = divided_patch_attention(qkv, ck, cv, cq, mode=mode, heads=heads)
        scale_a = float(np.max(np.abs(np.asarray(a, np.float32)))) + 1e-12
        for name, kw in VARIANTS.items():
            if not kw:
                continue
            f, _ = divided_patch_attention(
                qkv, ck, cv, cq, mode=mode, heads=heads, **kw
            )
            diff = float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(f, np.float32))))
            print(
                json.dumps(
                    {"metric": f"agreement_{mode}_{name}",
                     "max_abs_diff": round(diff, 6),
                     "rel": round(diff / scale_a, 6), "ok": diff <= 0.05 * scale_a}
                ),
                flush=True,
            )
            if diff > 0.05 * scale_a:
                print(json.dumps(
                    {"metric": "abort", "detail": f"{mode}/{name} disagreement"}
                ))
                return 1

    for mode in () if os.environ.get("HH_AB_EVAL_ONLY") == "1" else ("space", "time"):
        res = {}
        for name, kw in VARIANTS.items():

            @jax.jit
            def chain(x, ck=ck, cv=cv, cq=cq, mode=mode, kw=tuple(kw.items())):
                for _ in range(24):
                    out, _ = divided_patch_attention(
                        x, ck, cv, cq, mode=mode, heads=heads, **dict(kw)
                    )
                    x = jnp.concatenate([out, out, out], axis=-1)
                return x

            res[name] = timed(chain, qkv)
        print(
            json.dumps(
                {
                    "metric": f"attn24_{mode}_ms",
                    **{k: round(v * 1e3, 2) for k, v in res.items()},
                    "best": min(res, key=res.get),
                    "best_speedup": round(res["plain"] / min(res.values()), 4),
                }
            ),
            flush=True,
        )

    # ---- full eval forward A/B
    from dataclasses import replace

    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        decoder_forward,
        init_decoder_params,
        init_lavila_params,
        timesformer_large_config,
    )
    from helping_hand_for_egocentric_videos_tpu.models import obj_decoder as dec_mod
    from helping_hand_for_egocentric_videos_tpu.models.lavila import encode_image

    frames, batch = 16, 16
    cfg0 = timesformer_large_config(num_frames=frames)
    dec_cfg = DecoderConfig(num_frames=frames, pred_traj=False)
    key = jax.random.PRNGKey(0)
    backbone = init_lavila_params(key, cfg0)
    decoder = init_decoder_params(key, dec_cfg)
    video = jnp.asarray(
        rng.normal(size=(batch, frames, 224, 224, 3)).astype(np.float32)
    )
    npp = cfg0.visual.patches_per_frame

    def eval_rate(cfg, bb):
        @jax.jit
        def fwd(bb, dec, v):
            _, fmap = encode_image(bb, cfg, v, use_remat=False, dtype=jnp.bfloat16)
            grid = fmap[:, 1:, :].reshape(v.shape[0], frames, npp, -1)
            out = decoder_forward(dec, dec_cfg, grid)
            return dec_mod.obj_proj(dec, out.hs[-1])[:, -1]

        dt = timed(fwd, bb, decoder, video, reps=5)
        return batch / dt

    for quant in (False, True):
        bb = backbone
        if quant:
            from helping_hand_for_egocentric_videos_tpu.models.quant import (
                quantize_lavila_params,
            )

            bb = quantize_lavila_params(backbone)
        # config-level grid adds the per-mode policy the kernel-level grid
        # can't express: chains showed coal is mode-asymmetric (time +36%,
        # space -18%), so 'time' — coalesce temporal attention only — is
        # the predicted winner
        EVAL_VARIANTS = {
            "plain": (False, False),
            "fused": (True, False),
            "coal": (False, True),
            "fused_coal": (True, True),
            "coal_time": (False, "time"),
        }
        rates = {}
        for name, (fused, coal) in EVAL_VARIANTS.items():
            cfg = replace(
                cfg0,
                visual=replace(
                    cfg0.visual,
                    fused_den_attention=fused,
                    coalesced_epilogue=coal,
                ),
            )
            rates[name] = eval_rate(cfg, bb)
        print(
            json.dumps(
                {
                    "metric": "eval_16f_clips_per_sec"
                    + ("_int8" if quant else "_bf16"),
                    **{k: round(v, 2) for k, v in rates.items()},
                    "best": max(rates, key=rates.get),
                    "best_speedup": round(max(rates.values()) / rates["plain"], 4),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
