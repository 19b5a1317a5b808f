"""Pretraining step: frozen backbone -> object decoder -> combined loss.

One jit-compiled program reproducing the reference training iteration
(run/train.py:100-203):

1. frozen LaviLa forward in bf16 with rematerialised blocks (the
   reference's fp16 autocast + use_checkpoint=True, run/train.py:108-110);
2. decoder forward on the (B, T, N, C) patch grid;
3. EgoNCE over the *global* similarity matrix (the reference's explicit
   NCCL all_gather becomes XLA's all-gather via batch sharding);
4. Hungarian box losses for hand (queries 0:2) and object (2:nq) families
   on per-frame boxes;
5. word-level contrastive loss (x0.5);
6. AdamW on the decoder parameters only, with the reference's no-decay
   policy (biases; utils/train_utils.py:28-48) — bf16 has no GradScaler.

The backbone is computed OUTSIDE the gradient closure: it is frozen, so
its activations are constants of the differentiated function.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..losses import compute_box_loss, egonce_multi_positive_loss, word_contrastive_loss
from ..metrics.sim import compute_tv_accuracy, sim_matrix
from ..models import lavila, obj_decoder
from ..models.obj_decoder import DecoderConfig, decoder_forward

__all__ = ["TrainConfig", "TrainState", "make_optimizer", "pretrain_loss_and_metrics", "make_train_step"]


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 3e-5
    wd: float = 1e-5
    b1: float = 0.9
    b2: float = 0.999
    temperature: float = 0.07
    word_loss_weight: float = 0.5
    clip_grad: float = 0.0  # global-norm clip; 0 disables (the reference
    # ships clip_gradients but never calls it, utils/train_utils.py:15-25)
    rephrase_factor: int = 5
    resize: float = 224.0
    input_res: int = 224  # device-side preprocess target for uint8 video
    num_queries: int = 12  # == args.num_queries (summary query excluded)
    backbone_dtype: Any = jnp.bfloat16
    # Train-time random augmentation (data_loader/transforms.py:64-69).
    # ``augment=False`` is the reference's shipped force_centercrop=True
    # (run/train.py:443); True enables on-device RandomResizedCrop + flip
    # + jitter, with box targets transformed alongside (the reference's
    # random-crop path leaves boxes stale — see ops/preprocess.py).
    augment: bool = False
    randcrop_scale: tuple = (0.5, 1.0)
    color_jitter: tuple = (0.0, 0.0, 0.0)  # brightness, saturation, hue
    # LR schedule. The reference computes warmup_epochs = epochs/20 but
    # never consumes it (run/train.py:549 — a dead knob; its LR is the
    # constant 3e-5). "constant" preserves that parity; "warmup_cosine"
    # implements the implied schedule: linear warmup over warmup_steps,
    # then cosine decay to 0 at total_steps.
    schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 0


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with no weight decay on biases (reference optim_policy:
    no_decay = ['.ln_', '.bn', '.bias', ...] — in the decoder only bias
    names match, so decay applies to every weight/LN-scale/embedding).

    ``class_embed`` and ``vid_proj`` are frozen outright: the reference
    loss never touches them (embeds use txt_proj/obj_proj only,
    run/train.py:124-192; loss_cardinality is @torch.no_grad,
    model/box_utils.py:142-153), so their ``.grad`` stays None and torch
    AdamW skips them entirely — no update AND no weight decay. optax
    would otherwise decay them through their zero gradients, silently
    shrinking weights the reference leaves untouched (verified by the
    multi-step dynamics oracle, tests/test_reference_parity.py)."""

    def decay_mask(params):
        def rule(path, leaf):
            keys = [getattr(p, "key", None) for p in path]
            if keys[-1] != "b":
                return True
            # quirk: torch names the fused attention in-projection bias
            # ``in_proj_bias`` — no ``.bias`` substring — so the reference
            # optim_policy puts the q/k/v biases in the DECAY group while
            # every other bias (incl. ``out_proj.bias``) is exempt
            # (utils/train_utils.py:30; pinned by
            # tests/test_reference_parity.py::test_adamw_update_rule_parity)
            return any(k in ("wq", "wk", "wv") for k in keys)

        return jax.tree_util.tree_map_with_path(rule, params)

    if cfg.schedule == "warmup_cosine":
        if cfg.total_steps <= 0:
            raise ValueError("schedule='warmup_cosine' needs total_steps > 0")
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.lr,
            warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=cfg.total_steps,
        )
    elif cfg.schedule == "constant":
        lr = cfg.lr
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    opt = optax.adamw(lr, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.wd, mask=decay_mask)
    if cfg.clip_grad > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.clip_grad), opt)

    def labels(params):
        def rule(path, leaf):
            top = getattr(path[0], "key", None)
            return "freeze" if top in ("class_embed", "vid_proj") else "train"

        return jax.tree_util.tree_map_with_path(rule, params)

    return optax.multi_transform({"train": opt, "freeze": optax.set_to_zero()}, labels)


def backbone_features(
    backbone_params, lavila_cfg, video, tokens, *, dtype=jnp.bfloat16, use_remat=True
):
    """Frozen-backbone forward: returns the decoder inputs.

    video: (Bv, T, H, W, C) normalised; tokens: (Bt, 77).
    Returns (video_grid (Bv, T, N, C), text_fmap (Bt, 77, Wt)).

    ``use_remat`` cannot cause recompute here: this call sits OUTSIDE the
    loss grad closure and its outputs are stop_gradient'ed, so the
    checkpoint wrapper is differentiation-inert — the compiled train
    program has identical FLOPs either way (pinned by
    tests/test_train_step.py::test_frozen_backbone_remat_is_free).
    """
    out = lavila.lavila_forward(
        backbone_params, lavila_cfg, video, tokens, use_remat=use_remat, dtype=dtype
    )
    bv, t = video.shape[:2]
    n = lavila_cfg.visual.patches_per_frame
    grid = out["image_feature_map"][:, 1:, :].reshape(bv, t, n, -1)
    return jax.lax.stop_gradient(grid), jax.lax.stop_gradient(out["text_feature_map"])


def pretrain_loss_and_metrics(
    decoder_params,
    dec_cfg: DecoderConfig,
    cfg: TrainConfig,
    video_grid,
    text_fmap,
    tokens,
    noun_vec,
    verb_vec,
    boxes,
    noun_gt_inds,
    noun_dict_embeds,
    rng=None,
):
    """Compute the full training loss on (already extracted) backbone
    features. All batch dims are global; under pjit they arrive sharded.

    Shapes: video_grid (N_v, T, N, C); text_fmap (N_v*R, 77, Wt); tokens
    (N_v*R, 77); noun_vec (N_v, 582); verb_vec (N_v, 118); boxes
    (N_v, T, 4, 4) raw-pixel xyxy with slots [hand0, hand1, obj0, obj1];
    noun_gt_inds (N_v, M); noun_dict_embeds (V, Wt).
    """
    n_videos, t = video_grid.shape[:2]

    out = decoder_forward(
        decoder_params, dec_cfg, video_grid, rng=rng, deterministic=rng is None
    )

    # embeddings (run/train.py:120-125)
    eot = jnp.argmax(tokens, axis=-1)
    text_embeds = obj_decoder.txt_proj(
        decoder_params, text_fmap[jnp.arange(tokens.shape[0]), eot]
    )
    video_embeds = obj_decoder.obj_proj(decoder_params, out.hs[-1])[:, -1]

    # ---- EgoNCE over the global batch (run/train.py:134-148)
    sim = sim_matrix(text_embeds, video_embeds)  # (N_v*R, N_v)
    sim_v = sim_matrix(verb_vec, verb_vec)
    sim_n = sim_matrix(noun_vec, noun_vec)
    pad_rows = ((tokens != 0).sum(-1) != 2).astype(jnp.float32)
    nce_loss, _ = egonce_multi_positive_loss(
        sim, sim_v, sim_n, pad_rows, temperature=cfg.temperature
    )

    # ---- box losses on per-frame predictions (run/train.py:159-183)
    hand = boxes[:, :, :2, :].reshape(n_videos * t, 2, 4)
    obj = boxes[:, :, 2:, :].reshape(n_videos * t, -1, 4)
    loss_hand, _ = compute_box_loss(
        "hand_boxes", out.pred_boxes, hand, num_queries=cfg.num_queries, resize=cfg.resize
    )
    loss_obj, _ = compute_box_loss(
        "obj_boxes", out.pred_boxes, obj, num_queries=cfg.num_queries, resize=cfg.resize
    )
    box_loss = loss_hand + loss_obj

    # ---- word contrastive (run/train.py:186-192)
    noun_embeds = obj_decoder.txt_proj(decoder_params, noun_dict_embeds)
    pred_noun_embeds = obj_decoder.obj_proj(decoder_params, out.hs[-1])[:, :-1]
    word_loss = word_contrastive_loss(
        noun_embeds, pred_noun_embeds, noun_gt_inds, temperature=cfg.temperature
    )

    total = nce_loss + box_loss + cfg.word_loss_weight * word_loss

    # train-time accuracy on primary captions (run/train.py:154-157)
    r = cfg.rephrase_factor
    sim_primary = sim.reshape(n_videos, r, n_videos)[:, 0, :]
    acc_vt, acc_tv = compute_tv_accuracy(
        sim_primary, text_embeds, sim_v, sim_n, n_videos, rephrase_factor=r
    )

    metrics = {
        "total_loss": total,
        "nce_loss": nce_loss,
        "box_loss": box_loss,
        "word_loss": word_loss,
        "top1_video_to_text": acc_vt,
        "top1_text_to_video": acc_tv,
    }
    return total, metrics


def make_train_step(
    dec_cfg: DecoderConfig,
    lavila_cfg,
    cfg: TrainConfig,
    optimizer,
    *,
    debug_grads: bool = False,
):
    """Build the jittable train step.

    step(state, backbone_params, batch, noun_dict_embeds, rng) ->
    (state, metrics). ``batch`` keys: video, tokens, noun_vec, verb_vec,
    boxes, nouns (see pretrain_loss_and_metrics).

    ``debug_grads=True`` adds the raw gradient pytree to ``metrics`` —
    used by the sharded-vs-unsharded equivalence checks (the JAX analogue
    of asserting the reference's all-gather-gradient semantics,
    run/train.py:31-47, match a single-process run).
    """

    def step(state: TrainState, backbone_params, batch, noun_dict_embeds, rng):
        video = batch["video"]
        boxes = batch["boxes"]
        if cfg.augment and video.dtype != jnp.uint8:
            raise ValueError(
                "augment=True needs raw uint8 video (the aug pipeline crops "
                f"and normalises on device); got {video.dtype} — feed decoded "
                "frames, not preprocessed floats"
            )
        if video.dtype == jnp.uint8 and cfg.augment:
            # fused on-device random aug (transforms.py:64-69 train path)
            from ..ops.preprocess import (
                random_resized_crop_flip_jitter,
                transform_boxes,
            )

            if rng is None:  # callers may omit the key; stay deterministic
                rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            aug_key, rng = jax.random.split(rng)
            bj, sj, hj = cfg.color_jitter
            video, aug = random_resized_crop_flip_jitter(
                aug_key,
                video,
                cfg.input_res,
                scale=cfg.randcrop_scale,
                brightness=bj,
                saturation=sj,
                hue=hj,
            )
            boxes = transform_boxes(
                boxes, aug, res=cfg.input_res, coords_res=cfg.input_res
            )
        elif video.dtype == jnp.uint8:  # fused device-side preprocess
            from ..ops.preprocess import resize_normalize

            video = resize_normalize(video, cfg.input_res)
        video_grid, text_fmap = backbone_features(
            backbone_params,
            lavila_cfg,
            video,
            batch["tokens"],
            dtype=cfg.backbone_dtype,
        )

        def loss_fn(p):
            return pretrain_loss_and_metrics(
                p,
                dec_cfg,
                cfg,
                video_grid.astype(jnp.float32),
                text_fmap.astype(jnp.float32),
                batch["tokens"],
                batch["noun_vec"],
                batch["verb_vec"],
                boxes,
                batch["nouns"],
                noun_dict_embeds,
                rng=rng,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        if debug_grads:
            metrics["grads"] = grads
        return TrainState(params, opt_state, state.step + 1), metrics

    return step
