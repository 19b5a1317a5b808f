"""Word-level contrastive loss: object queries vs. ground-truth nouns.

Functional equivalent of the reference WordContrastiveLoss
(model/loss.py:72-106): per sample, Hungarian-match the (<=4) ground-truth
noun embeddings to the predicted object-query embeddings by cosine
similarity, then cross-entropy the matched predictions against the full
noun dictionary, masking out nouns whose embedding is too similar to the
ground-truth noun (> ``noun_threshold``) by filling their *logit* with -1
before the temperature division (model/loss.py:101-105).

Fixed-shape version: noun slots with index 0 are padding (the reference
filters them, loss.py:84-93); we mask them out of the matching and the
final mean instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..metrics.sim import sim_matrix
from ..ops.lap import solve_lap_batch

__all__ = ["word_contrastive_loss"]


def word_contrastive_loss(
    noun_embeds,
    pred_noun_embeds,
    noun_gt_inds,
    temperature: float = 0.07,
    noun_threshold: float = 0.6,
):
    """Args:
        noun_embeds: (V, E) projected noun-dictionary embeddings
            (V = 582 for the Ego4D taxonomy).
        pred_noun_embeds: (B, Q_obj, E) projected object-query states
            (obj_proj(hs[-1])[:, :-1], run/train.py:189).
        noun_gt_inds: (B, M) int noun ids; 0 = padding.
    Returns:
        scalar loss (mean CE over all valid noun slots).
    """
    b, m = noun_gt_inds.shape
    valid = noun_gt_inds != 0  # (B, M)

    gt = noun_embeds[noun_gt_inds]  # (B, M, E)
    # cost (targets=nouns as columns): -(cosine sim), matching without grad
    word_sim = -sim_matrix(gt, pred_noun_embeds)  # (B, M, Q)
    cost = jax.lax.stop_gradient(jnp.swapaxes(word_sim, 1, 2))  # (B, Q, M)
    t2p, _ = solve_lap_batch(cost, valid)  # (B, M)

    q = pred_noun_embeds.shape[1]
    sel = jnp.take_along_axis(
        pred_noun_embeds, jnp.clip(t2p, 0, q - 1)[..., None], axis=1
    )  # (B, M, E)

    sim_all = sim_matrix(sel.reshape(b * m, -1), noun_embeds)  # (B*M, V)

    noun_sim = sim_matrix(noun_embeds, noun_embeds)
    v = noun_sim.shape[0]
    noun_sim = noun_sim * (1.0 - jnp.eye(v, dtype=noun_sim.dtype))
    noun_mask = noun_sim[noun_gt_inds.reshape(-1)] > noun_threshold  # (B*M, V)

    logits = jnp.where(noun_mask, -1.0, sim_all) / temperature
    logp = jax.nn.log_softmax(logits, axis=-1)
    targets = noun_gt_inds.reshape(-1)
    ce = -logp[jnp.arange(b * m), targets]

    vmask = valid.reshape(-1).astype(ce.dtype)
    return jnp.sum(ce * vmask) / jnp.maximum(jnp.sum(vmask), 1.0)
