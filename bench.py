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

The headline (last line) is the unconditional bf16 eval path. The
int8-quantized line prints above it tagged ``gated_on:
real_weight_validation`` — int8 is rank-stability-validated on synthetic
weights (tests/test_quant.py::test_int8_retrieval_rank_stability) but not
yet on released checkpoints (absent from this environment), so it must
not headline a claim (VERDICT r3 item 7). HH_BENCH_INT8=0 skips it.

Wedge-proofing (VERDICT r3 item 1): a *subprocess* device probe with a
hard timeout runs before any jit — a dead axon tunnel blocks any
in-process device call forever — and a watchdog thread hard-exits with a
structured JSON line if the backend dies mid-run. Every exit path prints
a parseable final line and returns rc=0.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os

REFERENCE_CLIPS_PER_SEC = 30.0
# Derivation (BASELINE.md "Baseline assumption and roofline adjudication"):
# the reference publishes no throughput; the flagship 16f eval forward is
# ~3.3 TFLOP/clip (model-fixed), A100 fp16 dense peak is 312 TF/s, and the
# reference's unfused eager bs=1 torch eval loop (run/test_epic.py:319) is
# generously assumed to reach ~32% of that peak -> ~30 clips/s.
BASELINE_SOURCE = (
    "analytic estimate, no published number: ~3.4 TFLOP/clip fwd "
    "(utils/flops.py counter; BENCH_NOTES.md roofline) / A100 fp16 peak "
    "312 TF/s @ assumed 32% util for eager bs=1 torch eval (BASELINE.md; "
    "the 32% figure is cross-checked by a measured same-host CPU "
    "utilisation of the actual reference in BASELINE_MEASURED.json)"
)
# analytic counter: utils/flops.py (pinned by tests/test_bench.py); the
# r1-r4 BENCH_NOTES hand figure was 3.3e12 — the shared counter gives
# 3.46e12 (same counting rules, less rounding); mfu fields use the
# counter so eval and train lines are consistent
FLOPS_PER_CLIP_16F = 3.458e12  # flagship eval fwd @16f/224^2 + caption + decoder
V5E_PEAK_TFLOPS = {"bf16": 197.0, "int8": 394.0}
# Per-mode eval batch, set by the r5 on-chip batch sweep (tools/eval_sweep.py,
# BENCH_NOTES "Eval batch sweep"): bf16 rises mildly to bs64 (+1.9%); int8
# peaks at bs16 and regresses ~9% at bs>=32 (quant-stat kernels tile worse).
EVAL_BATCH = {"bf16": 64, "int8": 16}
FRAMES = 16
STEPS = 5
# HH_BENCH_INT8=0 drops the int8 headline line (bf16 becomes the headline)
INT8 = os.environ.get("HH_BENCH_INT8", "1") == "1"
# HH_BENCH_TRAIN=0 skips the train-step line (eval headline is printed last
# either way — the driver parses the final JSON line)
TRAIN = os.environ.get("HH_BENCH_TRAIN", "1") == "1"
# HH_BENCH_E2E=0 skips the end-to-end input-pipeline line
E2E = os.environ.get("HH_BENCH_E2E", "1") == "1"


def bench_train_step(int8_backbone: bool = False, augment: bool = False):
    """Full pretraining step (frozen ViT-L fwd + decoder fwd/bwd + EgoNCE +
    box/word losses + AdamW), 8 videos x 4 frames — the BENCH_NOTES train
    profile, made reproducible (VERDICT r1 item 8).

    int8_backbone: quantize the frozen tower's forward (--int8_backbone;
    gradients never reach it — loss parity test-gated,
    tests/test_train_step.py::test_int8_backbone_train_loss_parity)."""
    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        init_decoder_params,
        init_lavila_params,
        timesformer_large_config,
    )
    from helping_hand_for_egocentric_videos_tpu.train import (
        TrainConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    # 16 videos/chip = the reference's per-GPU batch (bs 128 over 8 GPUs,
    # run/train.py:592 + configs n_gpu); also measured faster than 8
    # (119.5 vs 108 bf16, 148.4 vs 134 int8 clips/s — BENCH_NOTES r3).
    # HH_BENCH_TRAIN_BS overrides for batch-scaling sweeps (BENCH_NOTES r5)
    t, n_videos, r = 4, int(os.environ.get("HH_BENCH_TRAIN_BS", "16")), 5
    cfg = timesformer_large_config(num_frames=t)
    dec_cfg = DecoderConfig(num_frames=t)
    tcfg = TrainConfig(augment=augment, color_jitter=(0.2, 0.2, 0.1) if augment else (0.0, 0.0, 0.0))
    key = jax.random.PRNGKey(0)
    backbone = init_lavila_params(key, cfg)
    if int8_backbone:
        from helping_hand_for_egocentric_videos_tpu.models.quant import (
            quantize_lavila_params,
        )

        backbone = quantize_lavila_params(backbone)
    decoder = init_decoder_params(key, dec_cfg)
    optimizer = make_optimizer(tcfg)
    state = TrainState(decoder, optimizer.init(decoder), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(0)
    tokens = np.zeros((n_videos * r, 77), np.int32)
    tokens[:, 0] = 49406
    tokens[:, 1:5] = rng.integers(1, 49000, size=(n_videos * r, 4))
    tokens[:, 5] = 49407
    if augment:  # aug path consumes raw uint8 at the decode size
        video = jnp.asarray(
            rng.integers(0, 256, size=(n_videos, t, 256, 256, 3)).astype(np.uint8)
        )
    else:
        video = jnp.asarray(
            rng.normal(size=(n_videos, t, 224, 224, 3)).astype(np.float32)
        )
    batch = {
        "video": video,
        "tokens": jnp.asarray(tokens),
        "noun_vec": jnp.asarray((rng.random((n_videos, 582)) < 0.02).astype(np.float32)),
        "verb_vec": jnp.asarray((rng.random((n_videos, 118)) < 0.05).astype(np.float32)),
        "boxes": jnp.asarray(
            (rng.random((n_videos, t, 4, 4)) * 150).astype(np.float32)
            + np.array([0, 0, 60, 60], np.float32)
        ),
        "nouns": jnp.asarray(rng.integers(0, 582, size=(n_videos, 4)).astype(np.int32)),
    }
    noun_dict = jnp.asarray(rng.normal(size=(582, 768)).astype(np.float32))

    step = jax.jit(make_train_step(dec_cfg, cfg, tcfg, optimizer))
    state, metrics = step(state, backbone, batch, noun_dict, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))  # warmup + sync

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, backbone, batch, noun_dict, jax.random.PRNGKey(2))
    float(metrics["total_loss"])  # device->host sync
    dt = time.perf_counter() - t0
    clips_per_sec = n_videos * STEPS / dt

    # train roofline (VERDICT r4 item 2): analytic per-clip FLOPs from the
    # shared counter; the frozen backbone contributes forward-only FLOPs
    # (feature extraction sits OUTSIDE the grad closure, train/step.py:286,
    # so no backbone backward / remat recompute exists in the program)
    from helping_hand_for_egocentric_videos_tpu.utils.flops import (
        text_fwd_flops,
        train_step_flops_per_clip,
        vision_fwd_flops,
    )

    train_flops = train_step_flops_per_clip(cfg, dec_cfg, rephrase_factor=r)
    if int8_backbone:
        # the quantized portion (frozen vision+text towers) runs on the
        # int8 MXU path (2x peak); the trained decoder stays f32/bf16 —
        # mfu is reported against the resulting mixed peak
        frozen = vision_fwd_flops(cfg.visual) + r * text_fwd_flops(cfg.text)
        rest = train_flops - frozen
        peak_tf = train_flops / (
            frozen / V5E_PEAK_TFLOPS["int8"] + rest / V5E_PEAK_TFLOPS["bf16"]
        )
    else:
        peak_tf = V5E_PEAK_TFLOPS["bf16"]
    line = {
        "metric": "train_clips_per_sec_per_chip_4f"
        + ("_int8_backbone" if int8_backbone else "")
        + ("_augmented" if augment else ""),
        "value": round(clips_per_sec, 3),
        "unit": "clips/s",
        "vs_baseline": None,  # reference publishes no train throughput
        "train_tflop_per_clip": round(train_flops / 1e12, 4),
        "mfu": round(clips_per_sec * train_flops / (peak_tf * 1e12), 4),
        "mfu_peak_assumed_tflops": round(peak_tf, 1),
        "batch_videos": n_videos,
    }
    if int8_backbone:
        line["gated_on"] = "real_weight_validation"
    print(json.dumps(line), flush=True)


def bench_e2e():
    """End-to-end input pipeline: chunked-``.npy`` clip store (the
    recommended TPU path, docs/DATA.md) -> read_clip_chunked 16-frame
    sampling -> PrefetchLoader threads -> uint8 device infeed -> fused
    on-device preprocess -> flagship eval forward.

    Prints the end-to-end clips/s plus its decomposition: the host stage
    alone, the measured device-infeed bandwidth, and the same forward on
    pre-staged device tensors. On this dev box the axon tunnel's ~13 MB/s
    infeed dominates; a real TPU host feeds chips over PCIe (GB/s), where
    e2e ~= min(host_stage, staged_model) (BENCH_NOTES.md round 3).
    """
    import tempfile

    from helping_hand_for_egocentric_videos_tpu.data.loader import (
        PrefetchLoader,
        ShardedSampler,
    )
    from helping_hand_for_egocentric_videos_tpu.data.video import read_clip_chunked
    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        decoder_forward,
        init_decoder_params,
        init_lavila_params,
        timesformer_large_config,
    )
    from helping_hand_for_egocentric_videos_tpu.models import obj_decoder as dec_mod
    from helping_hand_for_egocentric_videos_tpu.models.lavila import encode_image
    from helping_hand_for_egocentric_videos_tpu.ops.preprocess import resize_normalize

    b, n_chunks, chunk_frames, hw = 8, 6, 96, (256, 342)
    n_batches = 6  # all timed (the staged section below pre-compiles)
    cfg = timesformer_large_config(num_frames=FRAMES)
    dec_cfg = DecoderConfig(num_frames=FRAMES, pred_traj=False)
    key = jax.random.PRNGKey(0)
    backbone = init_lavila_params(key, cfg)
    decoder = init_decoder_params(key, dec_cfg)
    n = cfg.visual.patches_per_frame

    @jax.jit
    def eval_forward_u8(backbone, decoder, video_u8):
        video = resize_normalize(video_u8, 224)
        _, fmap = encode_image(backbone, cfg, video, use_remat=False, dtype=jnp.bfloat16)
        grid = fmap[:, 1:, :].reshape(video.shape[0], FRAMES, n, -1)
        out = decoder_forward(decoder, dec_cfg, grid)
        return dec_mod.obj_proj(decoder, out.hs[-1])[:, -1]

    with tempfile.TemporaryDirectory() as tmp:
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, size=(chunk_frames, *hw, 3)).astype(np.uint8)
        paths = []
        for c in range(n_chunks):
            p = os.path.join(tmp, f"{c}.mp4.npy")
            np.save(p, frames)
            paths.append(os.path.join(tmp, f"{c}.mp4"))

        class NpyClips:
            def __len__(self):
                return b * n_batches

            def __getitem__(self, i):
                start = (i * 0.37) % 2.0
                clip, _ = read_clip_chunked(
                    paths[i % n_chunks], start, start + 1.0, clip_length=FRAMES
                )
                return {"video": clip}

        dataset = NpyClips()

        def make_loader():
            sampler = ShardedSampler(
                len(dataset), b, shuffle=False, drop_last=True
            )
            return PrefetchLoader(dataset, sampler, num_threads=4, depth=2)

        # -- host stage alone
        t0 = time.perf_counter()
        n_clips = sum(batch["video"].shape[0] for batch in make_loader())
        host_rate = n_clips / (time.perf_counter() - t0)

        # -- infeed bandwidth (uint8 batch -> device, synced)
        probe = np.ascontiguousarray(frames[:FRAMES][None].repeat(b, 0))
        jax.device_put(probe)  # warm the transfer path
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(jnp.max(jax.device_put(probe)))
        infeed_mbps = probe.nbytes * 3 / (time.perf_counter() - t0) / 1e6

        # -- staged model rate (same jit program, data already on device)
        staged = jax.device_put(probe)
        np.asarray(eval_forward_u8(backbone, decoder, staged))  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            out = eval_forward_u8(backbone, decoder, staged)
        np.asarray(out)
        staged_rate = b * 3 / (time.perf_counter() - t0)

        # -- end to end: every batch timed, loader created inside the
        # window so the prefetcher's ramp-up (decode-ahead) counts as
        # pipeline overlap, not free pre-work (the jit program is already
        # compiled by the staged section above — same shapes)
        total = 0
        t0 = time.perf_counter()
        for batch in make_loader():
            out = eval_forward_u8(backbone, decoder, jnp.asarray(batch["video"]))
            total += batch["video"].shape[0]
        np.asarray(out)
        e2e_rate = total / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "clips_per_sec_e2e_16f_eval_bf16",
                "value": round(e2e_rate, 3),
                "unit": "clips/s",
                "host_stage_clips_per_sec": round(host_rate, 1),
                "device_infeed_MBps": round(infeed_mbps, 1),
                "staged_model_clips_per_sec": round(staged_rate, 3),
                "note": (
                    "dev-box axon tunnel bounds device infeed; on a PCIe-fed "
                    "TPU host e2e ~= min(host_stage, staged_model)"
                ),
            }
        ),
        flush=True,
    )


def main(quantize: bool):
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
        grid = fmap[:, 1:, :].reshape(b, FRAMES, n, -1)
        out = decoder_forward(decoder, dec_cfg, grid)
        video_embed = dec_mod.obj_proj(decoder, out.hs[-1])[:, -1]
        return video_embed, out.pred_boxes

    batch = EVAL_BATCH["int8" if quantize else "bf16"]
    video = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, FRAMES, 224, 224, 3)).astype(np.float32)
    )

    # warmup/compile; sync via a device->host copy (block_until_ready is
    # not a reliable fence on the experimental axon relay platform)
    np.asarray(eval_forward(backbone, decoder, video)[0])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = eval_forward(backbone, decoder, video)
    np.asarray(out[0])
    dt = time.perf_counter() - t0

    clips_per_sec = batch * STEPS / dt
    peak_tf = V5E_PEAK_TFLOPS["int8" if quantize else "bf16"]
    line = {
        "metric": "clips_per_sec_per_chip_16f_eval" + ("_int8" if quantize else ""),
        "value": round(clips_per_sec, 3),
        "unit": "clips/s",
        "batch": batch,
        "vs_baseline": round(clips_per_sec / REFERENCE_CLIPS_PER_SEC, 3),
        # the denominator is an ESTIMATE (30 clips/s fp16 A100) — the
        # reference publishes no throughput number; see BASELINE.md
        # "Baseline assumption and roofline adjudication".
        "baseline_assumed": True,
        "baseline_source": BASELINE_SOURCE,
        # model-FLOPs utilisation of the assumed chip peak, so the
        # per-chip-vs-pod reading of the >=5x target is explicit in the
        # JSON (VERDICT r3 item 5)
        "mfu": round(clips_per_sec * FLOPS_PER_CLIP_16F / (peak_tf * 1e12), 4),
        "mfu_peak_assumed_tflops": peak_tf,
    }
    if quantize:
        line["quant"] = "int8-w8a8-dynamic"
        line["gated_on"] = "real_weight_validation"
    print(json.dumps(line), flush=True)


def _probe_devices(timeout: float):
    """Delegates to the shared subprocess probe (cli/common.py)."""
    from helping_hand_for_egocentric_videos_tpu.cli.common import (
        bounded_device_probe,
    )

    return bounded_device_probe(timeout)


_LAST_PROGRESS = time.monotonic()


def _progress() -> None:
    """Mark liveness for the watchdog: a stage just completed."""
    global _LAST_PROGRESS
    _LAST_PROGRESS = time.monotonic()


def _watchdog_should_fire(
    now: float, t0: float, last_progress: float, deadline: float, stall: float
) -> bool:
    """Pure predicate for the mid-run watchdog: fire only when the hard
    deadline has passed AND no stage completed within the last ``stall``
    seconds (see _arm_watchdog docstring for why both are required)."""
    return now - t0 >= deadline and now - last_progress >= stall


def _arm_watchdog(deadline: float, stall: float) -> None:
    """Hard-exit with a structured final JSON line if the run wedges.

    The tunnel can die MID-run (observed r3: every device call then blocks
    in an uninterruptible retry loop). The driver parses the final JSON
    line, so a wedge must become a parseable line + rc=0, never rc=124.

    Fires only when BOTH hold: the hard deadline has passed AND no stage
    has completed within the last ``stall`` seconds — a healthy run can
    legitimately be silent for ~10 min through one cold remote compile,
    while a wedged tunnel is silent for hours. Distinguishing the two by
    silence length (not a device probe) matters because a TPU is held
    exclusively by this process: a mid-run probe subprocess would fail
    even on a healthy backend.
    """
    import threading

    t0 = time.monotonic()

    def _watch():
        while True:
            time.sleep(30)
            if not _watchdog_should_fire(
                time.monotonic(), t0, _LAST_PROGRESS, deadline, stall
            ):
                continue
            print(
                json.dumps(
                    {
                        "metric": "tpu_stalled_midrun",
                        "value": 0.0,
                        "unit": "clips/s",
                        "vs_baseline": None,
                        "detail": (
                            f"hard deadline {deadline:.0f}s passed and no "
                            f"stage completed for {stall:.0f}s; the device "
                            "backend likely wedged (see cli/doctor.py)"
                        ),
                    }
                ),
                flush=True,
            )
            os._exit(0)

    th = threading.Thread(target=_watch, daemon=True)
    th.start()


if __name__ == "__main__":
    _t0 = time.perf_counter()
    _budget = float(os.environ.get("HH_BENCH_BUDGET", "900"))

    _probe = _probe_devices(
        timeout=float(os.environ.get("HH_BENCH_PROBE_TIMEOUT", "120"))
    )
    if _probe is None:
        print(
            json.dumps(
                {
                    "metric": "tpu_unavailable",
                    "value": 0.0,
                    "unit": "clips/s",
                    "vs_baseline": None,
                    "detail": (
                        "bounded device probe failed or timed out before any "
                        "jit; backend down (dead axon tunnel?) — run "
                        "cli/doctor.py for diagnosis"
                    ),
                }
            ),
            flush=True,
        )
        raise SystemExit(0)

    _arm_watchdog(
        _budget + float(os.environ.get("HH_BENCH_GRACE", "480")),
        stall=float(os.environ.get("HH_BENCH_STALL", "1500")),
    )

    from helping_hand_for_egocentric_videos_tpu.cli.common import setup_compilation_cache

    setup_compilation_cache()

    def _optional(stage, fn, reserve: float):
        elapsed = time.perf_counter() - _t0
        if elapsed > _budget - reserve:
            print(
                json.dumps({"metric": f"{stage}_skipped", "reason": "time budget"}),
                flush=True,
            )
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — headline must still print
            print(
                json.dumps({"metric": f"{stage}_error", "error": str(e)[:300]}),
                flush=True,
            )
        finally:
            _progress()

    print(json.dumps({"metric": "device_probe", **_probe}), flush=True)
    if TRAIN:
        _optional("train", bench_train_step, reserve=120.0)
        if INT8:
            _optional(
                "train_int8", lambda: bench_train_step(int8_backbone=True), reserve=90.0
            )
        # HH_BENCH_AUG=1: measure the on-device random-aug train step
        # (uint8 256^2 in, crop/flip/jitter inside the jit) vs the plain
        # line above — the aug pipeline's overhead on chip
        if os.environ.get("HH_BENCH_AUG", "0") == "1":
            _optional(
                "train_aug", lambda: bench_train_step(augment=True), reserve=90.0
            )
    if E2E:
        _optional("e2e", bench_e2e, reserve=90.0)
    # int8 first (gated), bf16 LAST — the driver parses the final line as
    # the headline and the unconditional number must headline (VERDICT r3)
    if INT8:
        _optional("eval_int8", lambda: main(quantize=True), reserve=60.0)
    # the headline is NOT budget-skippable, but it must still honor the
    # contract that every exit path prints a parseable final line + rc=0
    try:
        main(quantize=False)
    except Exception as e:  # noqa: BLE001
        print(
            json.dumps(
                {
                    "metric": "eval_bf16_error",
                    "value": 0.0,
                    "unit": "clips/s",
                    "vs_baseline": None,
                    "error": str(e)[:300],
                }
            ),
            flush=True,
        )
    raise SystemExit(0)
