"""EgoNCE: symmetric InfoNCE with verb/noun-aware positives.

Matches the reference loss (model/loss.py:8-70) in both modes:

- single-positive: positives mask = (verb-sim * noun-sim) + diagonal.
- multi-positive (the training path, run/train.py:134-148): each video has
  R rephrased captions (rows sample-major: row = video_idx * R + r);
  padded captions (empty strings) are masked out row-wise. Positives =
  (verb-sim * noun-sim + caption->own-video diagonal) * pad-mask.

TPU-first: the reference drops fully-padded rows by boolean indexing
(model/loss.py:42-56) — a dynamic shape. We keep static shapes and apply
the row-validity mask inside the normalised sums; the math is identical
(dropped rows contribute exactly 0 to loss_i, and their -inf entries are
excluded from every column softmax in loss_j).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["egonce_loss", "egonce_multi_positive_loss"]

_NEG = -1e9


def _masked_log_softmax(logits, valid, axis):
    """log_softmax over ``axis`` restricted to ``valid`` entries."""
    logits = jnp.where(valid, logits, _NEG)
    return jax.nn.log_softmax(logits, axis=axis)


def egonce_loss(sim, mask_v=None, mask_n=None, temperature: float = 0.07):
    """Single-positive EgoNCE on a square (N, N) similarity matrix.

    Returns (loss, positives_mask). Reference: model/loss.py:16-24,58-70.
    """
    n = sim.shape[0]
    eye = jnp.eye(n, dtype=sim.dtype)
    if mask_v is not None and mask_n is not None:
        mask = mask_v * mask_n + eye
    elif mask_n is not None:
        mask = mask_n + eye
    elif mask_v is not None:
        mask = mask_v + eye
    else:
        mask = eye
    mask_bool = mask > 0

    i_sm = jax.nn.log_softmax(sim / temperature, axis=1)
    idiag = jnp.sum(i_sm * mask_bool, axis=1) / jnp.sum(mask_bool, axis=1)
    loss_i = jnp.mean(idiag)

    j_sm = jax.nn.log_softmax(sim.T / temperature, axis=1)
    jdiag = jnp.sum(j_sm * mask_bool.T, axis=1) / jnp.sum(mask_bool, axis=0)
    loss_j = jnp.mean(jdiag)
    return -loss_i - loss_j, mask_bool


def egonce_multi_positive_loss(
    sim,
    mask_v,
    mask_n,
    pad_mask,
    temperature: float = 0.07,
    vn_threshold: float = 0.0,
):
    """Multi-positive EgoNCE.

    Args:
        sim: (R*N, N) text->video similarity; text rows are sample-major
            (row = video * R + rephrase).
        mask_v / mask_n: (N, N) verb / noun tag similarity.
        pad_mask: (R*N,) or (R*N, N) float/bool; 0 marks padded captions
            (row-constant in the reference, run/train.py:144-145).
    Returns:
        (loss, positives_mask (R*N, N) bool).
    """
    rn, n = sim.shape
    r = rn // n

    if pad_mask.ndim == 2:
        row_valid = pad_mask[:, 0] > 0
    else:
        row_valid = pad_mask > 0
    pad2d = jnp.broadcast_to(row_valid[:, None], (rn, n)).astype(sim.dtype)

    eye = jnp.eye(n, dtype=sim.dtype)
    multi_pos = jnp.repeat(eye, r, axis=0)  # (R*N, N), row i*R+r -> eye row i
    if mask_v is not None and mask_n is not None:
        vn = jnp.repeat(mask_v * mask_n, r, axis=0)
        mask = (vn + multi_pos) * pad2d
    elif mask_n is not None:
        mask = (jnp.repeat(mask_n, r, axis=0) + multi_pos) * pad2d
    elif mask_v is not None:
        mask = (jnp.repeat(mask_v, r, axis=0) + multi_pos) * pad2d
    else:
        mask = multi_pos * pad2d
    mask_bool = mask > vn_threshold

    # text -> video (rows): softmax over videos; only valid rows counted.
    i_sm = jax.nn.log_softmax(sim / temperature, axis=1)
    row_pos = jnp.maximum(jnp.sum(mask_bool, axis=1), 1)
    idiag = jnp.sum(i_sm * mask_bool, axis=1) / row_pos
    n_valid = jnp.maximum(jnp.sum(row_valid), 1)
    loss_i = jnp.sum(jnp.where(row_valid, idiag, 0.0)) / n_valid

    # video -> text (columns): softmax over *valid* text rows.
    j_sm = _masked_log_softmax(sim / temperature, row_valid[:, None], axis=0)
    col_pos = jnp.maximum(jnp.sum(mask_bool, axis=0), 1)
    jdiag = jnp.sum(j_sm * mask_bool, axis=0) / col_pos
    loss_j = jnp.mean(jdiag)

    return -loss_i - loss_j, mask_bool
