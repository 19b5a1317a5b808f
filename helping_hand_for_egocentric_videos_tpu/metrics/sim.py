"""Device-side similarity and training-accuracy helpers (jittable).

``sim_matrix`` matches the reference model/metric.py:363-375 (cosine
similarity with an epsilon-floored norm); ``compute_tv_accuracy`` matches
model/metric.py:378-392 (EgoNCE-style positive-mask top-1 accuracy logged
during pretraining).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sim_matrix", "compute_tv_accuracy"]


def _normalize(a: jax.Array, eps: float) -> jax.Array:
    n = jnp.linalg.norm(a, axis=-1, keepdims=True)
    return a / jnp.maximum(n, eps)


def sim_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-8, norm: bool = True) -> jax.Array:
    """Cosine (or raw dot-product if ``norm=False``) similarity matrix.

    2D inputs -> (N, M); 3D inputs are treated as batched (B, N, D)x(B, M, D).
    """
    if norm:
        a = _normalize(a, eps)
        b = _normalize(b, eps)
    # Retrieval ranks are sensitive to matmul precision: force f32
    # accumulation on TPU instead of the default bf16 inputs.
    return jnp.matmul(a, jnp.swapaxes(b, -1, -2), precision="highest")


def compute_tv_accuracy(
    similarity: jax.Array,
    text_embeds: jax.Array,
    sim_v: jax.Array,
    sim_n: jax.Array,
    num_samples: int,
    rephrase_factor: int = 5,
):
    """Top-1 video<->text accuracy under the EgoNCE positive mask.

    Args:
        similarity: (N, N) text(first rephrase)->video similarity.
        text_embeds: (N * rephrase_factor, D) all gathered text embeddings;
            the every-``rephrase_factor``-th rows are the primary captions.
        sim_v / sim_n: (N, N) verb/noun tag similarity matrices.
        num_samples: N (global batch).
    Returns:
        (acc_vt, acc_tv) scalars in [0, 1].
    """
    tv_argmax = jnp.argmax(similarity, axis=-1)
    vt_argmax = jnp.argmax(similarity, axis=0)

    primaries = text_embeds[::rephrase_factor]
    same_neg = sim_matrix(primaries, primaries) > 0.99
    eye = jnp.eye(num_samples, dtype=similarity.dtype)
    same_neg = same_neg.astype(similarity.dtype) * (1.0 - eye)

    pos_mask = ((sim_v * sim_n) + eye + same_neg) > 0

    vt_onehot = jax.nn.one_hot(vt_argmax, num_samples, axis=0, dtype=similarity.dtype)
    acc_vt = jnp.mean((jnp.sum(vt_onehot * pos_mask, axis=0) > 0).astype(jnp.float32))
    tv_onehot = jax.nn.one_hot(tv_argmax, num_samples, dtype=similarity.dtype)
    acc_tv = jnp.mean((jnp.sum(tv_onehot * pos_mask, axis=-1) > 0).astype(jnp.float32))
    return acc_vt, acc_tv
