"""End-to-end training-step tests on tiny configs.

- single-device: loss is finite, decreases over a few steps on a fixed
  batch, and dropout rngs vary per step.
- 8-device CPU mesh: the full DP+TP sharded step runs (skipped on boxes
  with fewer devices; the driver also validates this path via
  __graft_entry__.dryrun_multichip).
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from conftest import require_devices

from helping_hand_for_egocentric_videos_tpu.models import (
    DecoderConfig,
    init_decoder_params,
    init_lavila_params,
)
from helping_hand_for_egocentric_videos_tpu.models.clip_text import TextConfig
from helping_hand_for_egocentric_videos_tpu.models.lavila import LavilaConfig
from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import SpaceTimeConfig
from helping_hand_for_egocentric_videos_tpu.train import (
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
)


def tiny_setup(n_videos=4, t=2):
    lavila_cfg = LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=28, patch_size=14, width=32, depth=2, heads=4, num_frames=t
        ),
        text=TextConfig(
            vocab_size=64, context_length=12, width=32, heads=4, layers=2, embed_dim=16
        ),
        embed_dim=16,
    )
    n = lavila_cfg.visual.patches_per_frame
    dec_cfg = DecoderConfig(
        d_model=32,
        nhead=4,
        num_layers=2,
        dim_feedforward=64,
        num_queries=13,
        num_classes=8,
        feature_dim=32,
        text_width=32,
        embed_dim=16,
        num_frames=t,
        patches_per_frame=n,
    )
    tcfg = TrainConfig(num_queries=12, backbone_dtype=jnp.float32, lr=1e-3)

    key = jax.random.PRNGKey(0)
    backbone = init_lavila_params(key, lavila_cfg)
    decoder = init_decoder_params(jax.random.PRNGKey(1), dec_cfg)

    rng = np.random.default_rng(0)
    r = tcfg.rephrase_factor
    tokens = np.zeros((n_videos * r, 12), np.int32)
    tokens[:, 0] = 62
    tokens[:, 1:4] = rng.integers(1, 60, size=(n_videos * r, 3))
    tokens[:, 4] = 63
    boxes = (rng.random((n_videos, t, 4, 4)) * 100).astype(np.float32)
    boxes[..., 2:] += 30
    batch = {
        "video": rng.normal(size=(n_videos, t, 28, 28, 3)).astype(np.float32),
        "tokens": jnp.asarray(tokens),
        "noun_vec": jnp.asarray((rng.random((n_videos, 20)) < 0.3).astype(np.float32)),
        "verb_vec": jnp.asarray((rng.random((n_videos, 10)) < 0.3).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "nouns": jnp.asarray(rng.integers(0, 30, size=(n_videos, 4)).astype(np.int32)),
    }
    batch["video"] = jnp.asarray(batch["video"])
    noun_dict = jnp.asarray(rng.normal(size=(30, 32)).astype(np.float32))
    return lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict


def test_train_step_loss_decreases():
    lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict = tiny_setup()
    optimizer = make_optimizer(tcfg)
    state = TrainState(decoder, optimizer.init(decoder), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(dec_cfg, lavila_cfg, tcfg, optimizer))

    losses = []
    for i in range(8):
        state, metrics = step(state, backbone, batch, noun_dict, None)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_warmup_cosine_schedule_update_magnitudes():
    """schedule='warmup_cosine': LR ramps 0 -> lr over warmup_steps then
    cosine-decays to 0 at total_steps (the reference computes
    warmup_epochs=epochs/20 but never consumes it, run/train.py:549 —
    constant stays the parity default). With a constant unit gradient,
    AdamW's update magnitude tracks the LR, so probe it at the ends."""
    import pytest

    from helping_hand_for_egocentric_videos_tpu.train.step import TrainConfig

    cfg = TrainConfig(lr=1e-2, wd=0.0, schedule="warmup_cosine", warmup_steps=10, total_steps=100)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    opt_state = opt.init(params)
    grads = {"w": jnp.ones((4,))}
    mags = []
    for _ in range(100):
        updates, opt_state = opt.update(grads, opt_state, params)
        mags.append(float(jnp.abs(updates["w"]).max()))
    assert mags[0] < 1e-3  # warmup starts at 0
    assert abs(mags[10] - 1e-2) / 1e-2 < 0.05  # peak ~ lr at end of warmup
    assert mags[-1] < 2e-4  # cosine tail -> ~0
    assert max(mags) == pytest.approx(mags[10], rel=0.05)
    # misconfiguration is rejected, constant ignores the step knobs
    with pytest.raises(ValueError):
        make_optimizer(TrainConfig(schedule="warmup_cosine"))
    with pytest.raises(ValueError):
        make_optimizer(TrainConfig(schedule="nope"))


def test_gradients_do_not_touch_backbone():
    # the loss function only takes decoder params; this asserts the
    # optimizer state tree matches the decoder tree (backbone frozen by
    # construction, like optim_policy freezing, train_utils.py:40-42)
    lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict = tiny_setup()
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(decoder)
    flat_opt = jax.tree.leaves(opt_state)
    flat_dec = jax.tree.leaves(decoder)
    # adam mu/nu per param
    assert len([x for x in flat_opt if hasattr(x, "shape")]) >= len(flat_dec)


def test_dropout_changes_loss():
    lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict = tiny_setup()
    optimizer = make_optimizer(tcfg)
    state = TrainState(decoder, optimizer.init(decoder), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(dec_cfg, lavila_cfg, tcfg, optimizer))
    _, m1 = step(state, backbone, batch, noun_dict, jax.random.PRNGKey(1))
    _, m2 = step(state, backbone, batch, noun_dict, jax.random.PRNGKey(2))
    assert float(m1["total_loss"]) != float(m2["total_loss"])


def test_int8_backbone_train_loss_parity():
    """--int8_backbone quantizes the FROZEN backbone's training forward;
    gradients never reach it, so the loss may only shift by feature
    quantization noise — and training must still converge."""
    from helping_hand_for_egocentric_videos_tpu.models.quant import (
        quantize_lavila_params,
    )

    lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict = tiny_setup()
    qbackbone = quantize_lavila_params(backbone)
    optimizer = make_optimizer(tcfg)
    step = jax.jit(make_train_step(dec_cfg, lavila_cfg, tcfg, optimizer))

    losses, qlosses = [], []
    state = TrainState(decoder, optimizer.init(decoder), jnp.zeros((), jnp.int32))
    qstate = TrainState(decoder, optimizer.init(decoder), jnp.zeros((), jnp.int32))
    for _ in range(4):
        state, m = step(state, backbone, batch, noun_dict, None)
        qstate, qm = step(qstate, qbackbone, batch, noun_dict, None)
        losses.append(float(m["total_loss"]))
        qlosses.append(float(qm["total_loss"]))
    assert np.isfinite(qlosses).all()
    assert qlosses[-1] < qlosses[0], qlosses
    # identical params -> the loss shift is pure feature-quantization
    # noise (<1%); later steps diverge by trajectory chaos on this tiny
    # high-lr model, so only step 1 compares meaningfully
    assert abs(losses[0] - qlosses[0]) / abs(losses[0]) < 0.01, (losses, qlosses)


@require_devices(8)
def test_dryrun_multichip_8dev():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_frozen_backbone_remat_is_free():
    """The frozen tower's remat wrapper must not add recompute: the
    feature extraction sits outside the grad closure with stop_gradient'ed
    outputs (train/step.py backbone_features), so the compiled train
    program's FLOPs are identical with use_remat on and off (VERDICT r4
    item 2's 'verify remat isn't recomputing the frozen forward')."""
    import optax

    from helping_hand_for_egocentric_videos_tpu.train.step import (
        backbone_features,
        pretrain_loss_and_metrics,
    )

    lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict = tiny_setup()

    def flops(use_remat: bool) -> float:
        def program(decoder, backbone, batch, noun_dict):
            grid, text_fmap = backbone_features(
                backbone,
                lavila_cfg,
                batch["video"],
                batch["tokens"],
                dtype=jnp.float32,
                use_remat=use_remat,
            )

            def loss_fn(p):
                return pretrain_loss_and_metrics(
                    p, dec_cfg, tcfg, grid, text_fmap, batch["tokens"],
                    batch["noun_vec"], batch["verb_vec"], batch["boxes"],
                    batch["nouns"], noun_dict,
                )

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(decoder)
            return loss, optax.global_norm(grads)

        compiled = jax.jit(program).lower(decoder, backbone, batch, noun_dict).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost["flops"])

    assert flops(True) == flops(False)
