"""EgoClip pretraining driver: the full train-and-eval loop.

Orchestrates what run/train.py:79-270,421-575 does in the reference:
build backbone + decoder, stream sharded EgoClip batches, run the jitted
train step, evaluate EgoMCQ every ``eval_freq`` steps, keep runtime
checkpoints (last k) and the best model by EgoMCQ Inter-video accuracy.

Everything device-side lives in train/step.py; this module is host glue.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from ..core.config import ExperimentConfig
from ..data import ClipTokenizer, PrefetchLoader, ShardedSampler, prepare_train_batch
from ..data.loader import device_prefetch
from ..data.egoclip import EgoClipConfig, EgoClipDataset, load_noun_dict
from ..models import (
    DecoderConfig,
    init_decoder_params,
    init_lavila_params,
    timesformer_base_config,
    timesformer_large_config,
)
from ..models.weights import (
    convert_decoder_checkpoint,
    convert_lavila_checkpoint,
    load_torch_state_dict,
)
from ..parallel import make_mesh, replicated, shard_batch
from ..train.evaluate import EvalModel, run_egomcq
from ..train.step import TrainConfig, TrainState, make_optimizer, make_train_step
from ..utils.logging import AverageMeter, MetricLogger, ProgressMeter

__all__ = ["build_models", "pretrain"]


def build_models(cfg: ExperimentConfig, rng_seed: int = 0):
    """-> (lavila_cfg, backbone_params, dec_cfg, decoder_params)."""
    from ..models.lavila import timesformer_tiny_config

    factory = {
        "timesformer_large": timesformer_large_config,
        "timesformer_base": timesformer_base_config,
        "timesformer_tiny": timesformer_tiny_config,
    }[cfg.model.backbone]
    lavila_cfg = factory(
        num_frames=cfg.data.num_frames, project_embed_dim=cfg.model.project_embed_dim
    )
    dec_cfg = DecoderConfig(
        num_queries=cfg.model.num_queries + 1,
        feature_dim=lavila_cfg.visual.width,
        text_width=lavila_cfg.text.width,
        embed_dim=cfg.model.project_embed_dim,
        num_frames=cfg.data.num_frames,
        patches_per_frame=lavila_cfg.visual.patches_per_frame,
        pred_traj=cfg.model.pred_traj,
    )
    key = jax.random.PRNGKey(rng_seed)
    if cfg.model.backbone_ckpt:
        sd = load_torch_state_dict(cfg.model.backbone_ckpt)
        if "visual.class_embedding" in sd:
            # stock OpenAI CLIP weights -> TimeSformer bootstrap, like the
            # reference factory on from-scratch runs (run/train.py:425-431)
            from ..models.weights import convert_openai_clip_checkpoint

            backbone = convert_openai_clip_checkpoint(
                sd,
                num_frames=cfg.data.num_frames,
                project_embed_dim=cfg.model.project_embed_dim,
            )
        else:
            backbone = convert_lavila_checkpoint(
                sd,
                visual_depth=lavila_cfg.visual.depth,
                text_layers=lavila_cfg.text.layers,
            )
    else:
        backbone = init_lavila_params(key, lavila_cfg)
    if cfg.model.decoder_ckpt:
        decoder = convert_decoder_checkpoint(load_torch_state_dict(cfg.model.decoder_ckpt))
    else:
        decoder = init_decoder_params(jax.random.PRNGKey(rng_seed + 1), dec_cfg)
    if cfg.model.int8_backbone:
        from ..models.quant import quantize_lavila_params

        backbone = quantize_lavila_params(backbone)
    return lavila_cfg, backbone, dec_cfg, decoder


def build_train_config(cfg: ExperimentConfig) -> TrainConfig:
    """ExperimentConfig -> the jit-static TrainConfig of the step fn.

    ``resize`` (the pixel normalizer of the box losses, run/train.py's
    args.resize) must track ``data.input_res``: the dataset scales box
    targets to input_res coordinates (data/egoclip.py::_scale_boxes), so
    a fixed 224 would skew Hungarian matching at other resolutions."""
    return TrainConfig(
        lr=cfg.optim.lr,
        wd=cfg.optim.wd,
        num_queries=cfg.model.num_queries,
        input_res=cfg.data.input_res,
        resize=float(cfg.data.input_res),
        backbone_dtype=jnp.bfloat16
        if cfg.parallel.backbone_dtype == "bfloat16"
        else jnp.float32,
        augment=cfg.data.augment,
        randcrop_scale=tuple(cfg.data.randcrop_scale),
        color_jitter=tuple(cfg.data.color_jitter),
    )


def pretrain(
    cfg: ExperimentConfig,
    *,
    max_steps: int | None = None,
    eval_limit: int | None = None,
    models=None,
):
    """Run pretraining. Returns (final TrainState, best Inter-video acc).

    ``models``: optional prebuilt (lavila_cfg, backbone, dec_cfg, decoder)
    — used by tests to run the full loop on tiny architectures."""
    exp_dir = os.path.join(cfg.output_dir, cfg.name)
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "running_config.json"), "w") as f:
        f.write(cfg.to_json())
    logger = MetricLogger(exp_dir, "train")
    val_logger = MetricLogger(exp_dir, "val")

    if models is None:
        models = build_models(cfg, cfg.optim.seed)
    lavila_cfg, backbone, dec_cfg, decoder = models
    tcfg = build_train_config(cfg)

    devices = jax.devices()
    if cfg.parallel.num_devices:
        devices = devices[: cfg.parallel.num_devices]
    mesh = make_mesh(devices, model_parallel=cfg.parallel.model_parallel)
    backbone = jax.device_put(backbone, replicated(mesh))

    tokenizer = ClipTokenizer()
    train_ds = EgoClipDataset(
        EgoClipConfig(
            meta_dir=cfg.data.meta_dir,
            data_dir=cfg.data.data_dir,
            split="train",
            num_frames=cfg.data.num_frames,
            input_res=cfg.data.input_res,
            frame_sample=cfg.data.frame_sample,
            loading=cfg.data.loading,
            seed=cfg.optim.seed + jax.process_index(),
        )
    )
    val_ds = EgoClipDataset(
        EgoClipConfig(
            meta_dir=cfg.data.meta_dir,
            data_dir=cfg.data.data_dir,
            split="val",
            num_frames=cfg.data.num_frames,
            input_res=cfg.data.input_res,
        )
    )
    _, noun_embeds_raw = load_noun_dict(cfg.data.meta_dir)
    noun_dict = jax.device_put(jnp.asarray(noun_embeds_raw), replicated(mesh))

    sampler = ShardedSampler(
        len(train_ds),
        cfg.data.batch_size,
        shuffle=True,
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
        seed=cfg.optim.seed,
    )
    loader = PrefetchLoader(
        train_ds,
        sampler,
        num_threads=cfg.data.num_workers,
        transform=lambda b: prepare_train_batch(b, tokenizer),
    )

    if cfg.optim.schedule != "constant":
        # epoch-denominated schedule knobs -> steps, now that the
        # per-host step count is known
        spe = max(len(sampler), 1)
        warm = cfg.optim.warmup_epochs
        if warm <= 0:
            warm = cfg.optim.epochs / 20  # the reference's own formula
        tcfg = dataclasses.replace(
            tcfg,
            schedule=cfg.optim.schedule,
            warmup_steps=int(warm * spe),
            total_steps=max(cfg.optim.epochs * spe, 1),
        )

    optimizer = make_optimizer(tcfg)
    state = TrainState(decoder, optimizer.init(decoder), jnp.zeros((), jnp.int32))
    state = jax.device_put(state, replicated(mesh))
    best_acc = 0.0

    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    if latest_step(ckpt_dir) is not None:
        restored, step0 = restore_checkpoint(
            ckpt_dir, template={"state": state, "best_acc": np.float64(0.0)}
        )
        state = jax.device_put(restored["state"], replicated(mesh))
        best_acc = float(restored["best_acc"])
        print(f"resumed from step {step0} (best_acc={best_acc:.3f})")

    step_fn = jax.jit(make_train_step(dec_cfg, lavila_cfg, tcfg, optimizer), donate_argnums=(0,))

    step = int(state.step)
    batch_time = AverageMeter("Time", ":.2f")
    data_time = AverageMeter("Data", ":.2f")
    losses = AverageMeter("Loss", ":.4f")
    progress = ProgressMeter(len(loader), [batch_time, data_time, losses], prefix="Train")

    rng = jax.random.PRNGKey(cfg.optim.seed)
    stop = False
    pending_save = None  # in-flight save-behind write (optim.async_save)
    pending_metrics = []  # sampled device scalars awaiting the flush cadence
    # one EvalModel for the whole run: its jitted closures take params as
    # ARGUMENTS, so swapping decoder_params per eval reuses the compiled
    # programs — rebuilding it each eval would recompile the full
    # backbone+decoder forward every eval_freq steps
    eval_model = EvalModel(
        backbone_params=backbone,
        lavila_cfg=lavila_cfg,
        decoder_params=state.params,
        dec_cfg=dec_cfg,
        tokenizer=tokenizer,
        input_res=cfg.data.input_res,
    )
    # epoch-granular resume, like the reference's checkpoint['epoch']
    # (run/train.py:523-546): restart at the epoch of the restored step
    # (a partial epoch replays from its start; the step counter and
    # save/eval cadence continue from the restored value)
    start_epoch = min(step // max(len(sampler), 1), cfg.optim.epochs)
    with mesh:
        for epoch in range(start_epoch, cfg.optim.epochs):
            sampler.set_epoch(epoch)
            end = time.time()

            def put(b):
                b.pop("text_str", None)
                return shard_batch(b, mesh)  # uint8 video: device preprocess

            # depth-2 device-side prefetch: the NEXT batch's host->device
            # DMA runs under the current step's compute (data/loader.py)
            for batch in device_prefetch(loader, put, depth=2):
                data_time.update(time.time() - end)
                rng, step_rng = jax.random.split(rng)  # is fused in the step
                if cfg.optim.profile_step and step + 1 == cfg.optim.profile_step:
                    # one-step device trace (SURVEY 5.1: real profiles, not
                    # wall-clock); inspect with utils/profiling.top_ops
                    from ..utils.profiling import trace

                    with trace(os.path.join(exp_dir, "profile")):
                        state, metrics = step_fn(
                            state, backbone, batch, noun_dict, step_rng
                        )
                        jax.block_until_ready(metrics["total_loss"])
                else:
                    state, metrics = step_fn(state, backbone, batch, noun_dict, step_rng)
                step += 1
                if step % 5 == 0 or max_steps:
                    # defer the device->host pull: keep the (tiny) scalar
                    # arrays and flush on log_flush_iter cadence, so the
                    # sample itself never syncs the dispatch queue
                    pending_metrics.append(
                        (step, metrics, 1.0 / max(time.time() - end, 1e-6))
                    )
                if pending_metrics and (
                    step % max(cfg.optim.log_flush_iter, 1) == 0 or max_steps
                ):
                    for s, dev_m, sps in pending_metrics:
                        m = {k: float(v) for k, v in dev_m.items()}
                        losses.update(m["total_loss"])
                        logger.log(s, m, prefix="local/")
                        logger.log(s, {"sps": sps}, prefix="device/")
                    pending_metrics.clear()
                batch_time.update(time.time() - end)
                end = time.time()
                if step % 100 == 0:
                    progress.display(step % max(len(loader), 1))

                if step % cfg.optim.runtime_save_iter == 0:
                    if pending_save is not None:
                        pending_save.result()  # writes serialize in order
                        pending_save = None
                    saved = save_checkpoint(
                        ckpt_dir,
                        step,
                        {"state": state, "best_acc": np.float64(best_acc)},
                        keep=cfg.optim.keep_checkpoints,
                        block=not cfg.optim.async_save,
                    )
                    if not isinstance(saved, str):
                        pending_save = saved

                if step % cfg.optim.eval_freq == 0 or (max_steps and step >= max_steps):
                    eval_model.decoder_params = state.params
                    res = run_egomcq(eval_model, val_ds, limit=eval_limit or 1000)
                    val_logger.log(step, {k: v for k, v in res.items()}, prefix="egomcq/")
                    inter = res.get("Inter-video", 0.0)
                    if inter > best_acc:
                        best_acc = inter
                        save_checkpoint(
                            os.path.join(exp_dir, "best"),
                            step,
                            {"state": state, "best_acc": np.float64(best_acc)},
                            keep=1,
                        )
                if max_steps and step >= max_steps:
                    stop = True
                    break
            if stop:
                break

    if pending_save is not None:
        pending_save.result()
    for s, dev_m, sps in pending_metrics:  # tail flush
        m = {k: float(v) for k, v in dev_m.items()}
        losses.update(m["total_loss"])
        logger.log(s, m, prefix="local/")
        logger.log(s, {"sps": sps}, prefix="device/")
    logger.close()
    val_logger.close()
    return state, best_acc
