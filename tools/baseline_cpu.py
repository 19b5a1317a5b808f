"""Measured same-host baseline: reference torch eval forward vs this framework.

The reference publishes no throughput numbers (SURVEY.md section 6), so
every ``vs_baseline`` ratio in BENCH_r*.json divides by an *assumption*
(BASELINE.md).  This tool replaces the weakest link with a measurement:
it runs

  (a) the ACTUAL reference model (built from /root/reference, torch CPU,
      eager, f32, random weights) through its eval forward —
      ``CLIP.forward(video, text, return_feature_map=True)`` at bs=1,
      exactly the per-item work of the Epic-MIR harness loop
      (run/test_epic.py:187-230); and
  (b) this framework's equivalent forward (``lavila_forward``, jitted,
      f32) at identical shapes on the SAME host CPU,

and records clips/s for both plus the ratio.  This does not replace the
A100 estimate — a CPU ratio between frameworks is not a GPU-vs-TPU
ratio — but it turns "assumed 30 clips/s" into "measured: on identical
silicon this framework's compiled forward is Nx the reference's eager
forward", which bounds the assumption from data.

Usage:
  python tools/baseline_cpu.py both            # orchestrates the runs below
  python tools/baseline_cpu.py torch --config base --frames 4
  python tools/baseline_cpu.py jax   --config large --frames 16

``both`` runs each side in its own subprocess (clean thread pools, clean
JAX_PLATFORMS=cpu) and writes BASELINE_MEASURED.json at the repo root.

The reference-import shim mirrors tests/test_reference_parity.py:57-143
(timm/ftfy/torchvision stand-ins providing exactly the symbols the
reference imports; the timed code path never calls them).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# vision (width, depth, heads, patch) + text (twidth, theads, tlayers) per
# config — mirrors CLIP_OPENAI_TIMESFORMER_{BASE,LARGE}
# (model/LaviLa.py:55-111 and :114-172); both sides must agree.
CONFIGS = {
    "base": dict(width=768, depth=12, heads=12, patch=16,
                 twidth=512, theads=8, tlayers=12),
    "large": dict(width=1024, depth=24, heads=16, patch=14,
                  twidth=768, theads=12, tlayers=12),
}
IMG, CTX, VOCAB, EMBED = 224, 77, 49408, 256


def fwd_flops_per_clip(config: str, frames: int) -> float:
    """Analytic forward FLOPs (2 per MAC) for one clip + one caption.

    Divided space-time attention: separate qkv+proj for the temporal and
    spatial passes (model/LaviLa.py:226-303), spatial scores within each
    frame, temporal scores across frames per patch.  Reproduces the
    BENCH_NOTES.md ~3.3 TFLOP figure for large-16f (this formula gives
    3.43e12; the delta is epilogue/nonlinearity counting noise).
    """
    c = CONFIGS[config]
    d, depth, t = c["width"], c["depth"], frames
    n = (IMG // c["patch"]) ** 2
    s = 1 + n * t
    per_block = (
        8 * s * d * d      # spatial attn qkv + out proj
        + 8 * s * d * d    # temporal attn qkv + out proj
        + 4 * t * n * n * d  # spatial scores + values (per frame)
        + 4 * n * t * t * d  # temporal scores + values (per patch)
        + 16 * s * d * d   # MLP (ratio 4)
    )
    patchify = n * t * d * (c["patch"] ** 2 * 3) * 2
    td = c["twidth"]
    text = c["tlayers"] * (24 * CTX * td * td + 4 * CTX * CTX * td)
    return float(depth * per_block + patchify + text)


def run_peak(side: str, iters: int = 8) -> dict:
    """Measured dense-matmul ceiling on this host (f32, 2048^3) — the
    denominator for 'what fraction of practical peak does the eval
    forward achieve', the same utilisation quantity BASELINE.md assumes
    at 32% for eager torch on A100."""
    k = 2048
    flops = 2.0 * k * k * k
    if side == "torch":
        import torch

        a = torch.randn(k, k)
        b = torch.randn(k, k)
        times = _time_loop(lambda: torch.mm(a, b), 2, iters)
    else:
        import jax
        import jax.numpy as jnp
        import numpy as np

        if jax.devices()[0].platform != "cpu":
            raise RuntimeError("peak probe must run on the cpu backend")
        a = jnp.asarray(np.random.default_rng(0).normal(size=(k, k)), jnp.float32)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(k, k)), jnp.float32)
        f = jax.jit(lambda a, b: a @ b)
        times = _time_loop(lambda: np.asarray(f(a, b)), 2, iters)
    gflops = flops / statistics.median(times) / 1e9
    return {"side": side, "matmul_gflops_f32": round(gflops, 1)}


def _make_inputs(frames: int):
    import numpy as np

    rng = np.random.default_rng(0)
    video = rng.normal(size=(1, frames, IMG, IMG, 3)).astype("float32")
    tokens = rng.integers(1, VOCAB - 2, size=(1, CTX)).astype("int64")
    tokens[0, 0] = VOCAB - 2
    tokens[0, 20] = VOCAB - 1  # EOT = argmax id (model/LaviLa.py:665)
    tokens[0, 21:] = 0
    return video, tokens


def _time_loop(step, warmup: int, iters: int):
    for _ in range(warmup):
        step()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    return times


def run_torch(config: str, frames: int, warmup: int, iters: int) -> dict:
    # install the reference's missing-dep stand-ins BEFORE importing it
    # (same shim set as tests/test_reference_parity.py:57-143)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    os.environ.setdefault("HH_SKIP_JAX_IMPORT", "1")
    import types

    import torch

    from test_reference_parity import _install_stubs  # noqa: E402

    _install_stubs()
    import torch.nn as nn  # noqa: E402

    from model.LaviLa import CLIP, SpaceTimeTransformer  # noqa: E402
    from model.openai_model import QuickGELU  # noqa: E402

    # Construct exactly what CLIP_OPENAI_TIMESFORMER_{BASE,LARGE} builds
    # (model/LaviLa.py:55-111, :114-172) minus the pretrained-weight
    # download (zero egress; random weights are fine — timing only).
    c = CONFIGS[config]
    torch.manual_seed(0)
    vision_model = SpaceTimeTransformer(
        img_size=IMG, patch_size=c["patch"], embed_dim=c["width"],
        depth=c["depth"], num_heads=c["heads"], num_frames=frames,
        time_init="zeros", attention_style="frozen-in-time",
        ln_pre=True, act_layer=QuickGELU,
    )
    vision_model.head = nn.Identity()
    vision_model.pre_logits = nn.Identity()
    vision_model.fc = nn.Identity()
    model = CLIP(
        embed_dim=EMBED, vision_width=c["width"], vision_model=vision_model,
        context_length=CTX, vocab_size=VOCAB, transformer_width=c["twidth"],
        transformer_heads=c["theads"], transformer_layers=c["tlayers"],
        tempearture_init=0.07,
    ).eval()

    video_np, tokens_np = _make_inputs(frames)
    # reference layout is (B, T, C, H, W) (model/LaviLa.py:537-539)
    video = torch.from_numpy(video_np).permute(0, 1, 4, 2, 3).contiguous()
    tokens = torch.from_numpy(tokens_np)

    @torch.no_grad()
    def step():
        out = model(video, tokens, return_feature_map=True)
        # the harness moves embeds to host every item (run/test_epic.py:229-230)
        return out["image_embed"].numpy(), out["text_embed"].numpy()

    times = _time_loop(step, warmup, iters)
    return {
        "side": "torch-reference-eager",
        "torch_threads": torch.get_num_threads(),
        "times_s": [round(t, 3) for t in times],
        "sec_per_clip": round(statistics.median(times), 3),
        "clips_per_sec": round(1.0 / statistics.median(times), 4),
    }


def run_jax(config: str, frames: int, warmup: int, iters: int) -> dict:
    # same-silicon rule: the host CPU backend only. NOTE: the axon TPU
    # plugin registers at interpreter startup (sitecustomize), so
    # PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu must be set in the
    # *launching* environment — the ``both`` orchestrator does this; a
    # direct ``jax`` invocation must do it on the command line.
    import jax

    platform = jax.devices()[0].platform
    if platform != "cpu":
        raise RuntimeError(
            f"same-silicon rule violated: jax backend is {platform}; "
            "launch with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"
        )
    import jax.numpy as jnp
    import numpy as np

    from helping_hand_for_egocentric_videos_tpu.models import init_lavila_params
    from helping_hand_for_egocentric_videos_tpu.models.lavila import (
        lavila_forward,
        timesformer_base_config,
        timesformer_large_config,
    )

    cfg = {
        "base": timesformer_base_config,
        "large": timesformer_large_config,
    }[config](num_frames=frames, project_embed_dim=EMBED)
    params = init_lavila_params(jax.random.PRNGKey(0), cfg)

    video_np, tokens_np = _make_inputs(frames)
    video = jnp.asarray(video_np)
    tokens = jnp.asarray(tokens_np.astype("int32"))

    @jax.jit
    def fwd(params, video, tokens):
        out = lavila_forward(
            params, cfg, video, tokens, use_remat=False, dtype=jnp.float32
        )
        return out["image_embed"], out["text_embed"]

    def step():
        a, b = fwd(params, video, tokens)
        return np.asarray(a), np.asarray(b)

    times = _time_loop(step, warmup, iters)
    return {
        "side": "jax-framework-jit-f32",
        "jax_platform": platform,
        "times_s": [round(t, 3) for t in times],
        "sec_per_clip": round(statistics.median(times), 3),
        "clips_per_sec": round(1.0 / statistics.median(times), 4),
    }


def _run_side(side: str, extra: list, timeout_s: int = 3600) -> dict:
    env = dict(os.environ)
    if side in ("jax", "peak-jax"):
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), side, *extra],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout_s,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{side} {extra} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_both(args) -> None:
    peaks = {}
    for side in ("torch", "jax"):
        print(f"[baseline_cpu] peak matmul probe: {side} ...", flush=True)
        peaks[side] = _run_side(f"peak-{side}", [])
        print(json.dumps(peaks[side]), flush=True)

    points = []
    grid = [("base", 4, 1, 5), ("large", 16, 1, 3)]
    if args.quick:
        grid = [("base", 4, 1, 3)]
    for config, frames, warmup, iters in grid:
        flops = fwd_flops_per_clip(config, frames)
        row = {"config": config, "frames": frames, "bs": 1,
               "shape": f"1x{frames}x{IMG}x{IMG}x3 + 1x{CTX} tokens",
               "analytic_fwd_tflop_per_clip": round(flops / 1e12, 4)}
        extra = ["--config", config, "--frames", str(frames),
                 "--warmup", str(warmup), "--iters", str(iters)]
        for side in ("torch", "jax"):
            print(f"[baseline_cpu] running {side} {config} {frames}f ...", flush=True)
            row[side] = _run_side(side, extra)
            # utilisation of this host's measured matmul ceiling — the
            # quantity BASELINE.md assumes at 32% for A100 eager torch
            row[side]["util_of_matmul_peak"] = round(
                row[side]["clips_per_sec"] * flops
                / (peaks[side]["matmul_gflops_f32"] * 1e9), 3
            )
        row["jax_over_torch"] = round(
            row["jax"]["clips_per_sec"] / row["torch"]["clips_per_sec"], 3
        )
        points.append(row)
        print(json.dumps(row), flush=True)

    result = {
        "what": "same-host CPU: reference torch eager eval forward vs this "
                "framework's jitted f32 forward, identical shapes "
                "(run/test_epic.py:187-230 per-item work)",
        "host_nproc": os.cpu_count(),
        "matmul_peak": peaks,
        "points": points,
    }
    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[baseline_cpu] wrote {out_path}", flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("side", choices=["torch", "jax", "both", "peak-torch", "peak-jax"])
    p.add_argument("--config", default="base", choices=list(CONFIGS))
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--quick", action="store_true", help="both: base-4f only")
    args = p.parse_args()
    if args.side == "both":
        run_both(args)
        return
    if args.side.startswith("peak-"):
        print(json.dumps(run_peak(args.side.split("-")[1])), flush=True)
        return
    fn = {"torch": run_torch, "jax": run_jax}[args.side]
    print(json.dumps(fn(args.config, args.frames, args.warmup, args.iters)), flush=True)


if __name__ == "__main__":
    main()
