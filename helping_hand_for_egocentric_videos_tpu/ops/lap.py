"""Exact, jittable linear assignment (Hungarian matching) for DETR losses.

The reference solves its matching problems with per-sample scipy
``linear_sum_assignment`` calls on the host (model/box_utils.py:89-91,
model/loss.py:92), forcing a device->CPU sync every step for every aux
layer and box type. On TPU we keep the whole loss on-device.

Every matching problem in this framework is tiny and *narrow*: at most 2
hand boxes, 2 object boxes, or 4 ground-truth nouns are matched against
2..13 predictions. We exploit that with an exact dynamic program over
subsets of targets — O(N * 2^M * M) with M = number of target slots — which
is fully vectorised (no sequential augmenting paths) and therefore maps
well onto the VPU. For M <= 8 this is a few thousand fused flops per
problem; ``vmap`` batches it across samples, frames and aux layers.

Semantics: identical optimal cost to scipy's rectangular LSAP with
``n_targets <= n_preds`` (each valid target gets a distinct prediction).
When multiple assignments tie, an arbitrary optimal one is returned (the
losses only depend on the matched cost/boxes, not on which optimum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["solve_lap", "solve_lap_batch"]

_INF = jnp.float32(1e9)


@functools.partial(jax.jit, static_argnames=("num_targets",))
def solve_lap(cost: jax.Array, target_valid: jax.Array, *, num_targets: int | None = None):
    """Solve min-cost assignment of targets to predictions.

    Args:
        cost: (N, M) float cost of assigning target j to prediction i.
        target_valid: (M,) bool; invalid targets are ignored entirely.
        num_targets: static override of M (defaults to cost.shape[1]).

    Returns:
        target_to_pred: (M,) int32 — for each target, the index of its
            matched prediction, or -1 for invalid targets.
        total_cost: () float32 — cost of the optimal assignment over valid
            targets (0 if none are valid).

    Requires (#valid targets) <= N, which holds by construction for every
    matching in this framework. M must be small (<= ~10): the DP has 2^M
    states.
    """
    n_preds, m = cost.shape
    if num_targets is None:
        num_targets = m
    assert num_targets == m
    assert m <= 12, "subset-DP LAP is for narrow problems; use blocks of <=12 targets"
    n_states = 1 << m

    cost = cost.astype(jnp.float32)
    valid = target_valid.astype(bool)

    states = jnp.arange(n_states, dtype=jnp.int32)  # (S,)
    t_bits = jnp.int32(1) << jnp.arange(m, dtype=jnp.int32)  # (M,)
    # contains[S, t]: does subset S contain target t?
    contains = (states[:, None] & t_bits[None, :]) != 0  # (S, M)
    prev_state = states[:, None] ^ jnp.where(contains, t_bits[None, :], 0)

    # f[S] = min cost to cover subset S using preds seen so far.
    f0 = jnp.where(states == 0, 0.0, _INF)

    def step(i, carry):
        f, choices = carry
        # cand[S, t] = f[S \ t] + cost[i, t], if t in S and t valid
        gathered = f[prev_state]  # (S, M)
        allowed = contains & valid[None, :]
        cand = jnp.where(allowed, gathered + cost[i][None, :], _INF)
        best_t_cost = jnp.min(cand, axis=1)  # (S,)
        best_t = jnp.argmin(cand, axis=1).astype(jnp.int32)  # (S,)
        take = best_t_cost < f  # strictly better than leaving pred i unmatched
        f_new = jnp.where(take, best_t_cost, f)
        choice_i = jnp.where(take, best_t, -1)  # (S,)
        choices = choices.at[i].set(choice_i)
        return f_new, choices

    choices0 = jnp.full((n_preds, n_states), -1, dtype=jnp.int32)
    f, choices = jax.lax.fori_loop(0, n_preds, step, (f0, choices0))

    full_state = jnp.sum(jnp.where(valid, t_bits, 0)).astype(jnp.int32)
    total_cost = f[full_state]

    # Backtrack pred-by-pred from the full valid subset.
    def back(k, carry):
        i = n_preds - 1 - k
        state, t2p = carry
        t = choices[i, state]

        def taken(args):
            state, t2p = args
            t2p = t2p.at[t].set(i)
            return state ^ (jnp.int32(1) << t), t2p

        state, t2p = jax.lax.cond(t >= 0, taken, lambda a: a, (state, t2p))
        return state, t2p

    t2p0 = jnp.full((m,), -1, dtype=jnp.int32)
    _, target_to_pred = jax.lax.fori_loop(0, n_preds, back, (full_state, t2p0))

    total_cost = jnp.where(full_state == 0, 0.0, total_cost)
    return target_to_pred, total_cost


def solve_lap_batch(cost: jax.Array, target_valid: jax.Array):
    """``solve_lap`` vmapped over a leading batch dimension.

    cost: (B, N, M); target_valid: (B, M) ->
    (B, M) target_to_pred, (B,) total_cost.
    """
    return jax.vmap(lambda c, v: solve_lap(c, v))(cost, target_valid)
