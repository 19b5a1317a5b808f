"""Gradient correctness of the full loss stack.

- finite-difference check of the combined pretraining loss wrt sampled
  decoder parameters (covers EgoNCE + Hungarian box losses + word loss
  end-to-end, including stop_gradient boundaries around matching);
- overfit test: a few Adam steps on a fixed batch must drive the box loss
  down (shows matched-box supervision actually reaches the bbox head).
"""

import numpy as np
import jax
import jax.numpy as jnp

from test_train_step import tiny_setup

from helping_hand_for_egocentric_videos_tpu.train import (
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
)
from helping_hand_for_egocentric_videos_tpu.train.step import (
    backbone_features,
    pretrain_loss_and_metrics,
)


def _loss_fn_factory():
    lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict = tiny_setup()
    grid, tfmap = backbone_features(
        backbone, lavila_cfg, batch["video"], batch["tokens"], dtype=jnp.float32
    )

    def loss_fn(p):
        total, _ = pretrain_loss_and_metrics(
            p,
            dec_cfg,
            tcfg,
            grid,
            tfmap,
            batch["tokens"],
            batch["noun_vec"],
            batch["verb_vec"],
            batch["boxes"],
            batch["nouns"],
            noun_dict,
            rng=None,
        )
        return total

    return loss_fn, decoder


def test_finite_difference_gradients():
    loss_fn, params = _loss_fn_factory()
    loss_fn = jax.jit(loss_fn)
    grads = jax.jit(jax.grad(loss_fn))(params)

    flat_p, tree = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_flatten(grads)[0]

    rng = np.random.default_rng(0)
    eps = 1e-3
    checked = 0
    # probe a few random scalar coordinates in a few random leaves
    for li in rng.choice(len(flat_p), size=5, replace=False):
        leaf = np.asarray(flat_p[li], dtype=np.float64)
        if leaf.size == 0:
            continue
        idx = np.unravel_index(int(rng.integers(leaf.size)), leaf.shape)
        g = float(np.asarray(flat_g[li])[idx])

        def perturbed(delta):
            leaf2 = np.asarray(flat_p[li]).copy()
            leaf2[idx] += delta
            flat2 = list(flat_p)
            flat2[li] = jnp.asarray(leaf2)
            return float(loss_fn(jax.tree_util.tree_unflatten(tree, flat2)))

        fd = (perturbed(eps) - perturbed(-eps)) / (2 * eps)
        # loose tolerance: f32 loss, central difference
        assert abs(fd - g) <= 2e-2 + 0.05 * max(abs(fd), abs(g)), (li, idx, fd, g)
        checked += 1
    assert checked >= 3


def test_overfit_box_loss_decreases():
    lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict = tiny_setup()
    tcfg = TrainConfig(num_queries=12, backbone_dtype=jnp.float32, lr=3e-3)
    optimizer = make_optimizer(tcfg)
    state = TrainState(decoder, optimizer.init(decoder), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(dec_cfg, lavila_cfg, tcfg, optimizer))

    first_box, last_box = None, None
    for i in range(25):
        state, m = step(state, backbone, batch, noun_dict, None)
        if i == 0:
            first_box = float(m["box_loss"])
        last_box = float(m["box_loss"])
    assert np.isfinite(last_box)
    assert last_box < 0.7 * first_box, (first_box, last_box)
