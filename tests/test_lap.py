"""Jittable LAP vs scipy.optimize.linear_sum_assignment (the reference's
solver, model/box_utils.py:91) across random rectangular problems."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from helping_hand_for_egocentric_videos_tpu.ops.lap import solve_lap, solve_lap_batch


def scipy_cost(cost, valid):
    c = cost[:, valid]
    if c.shape[1] == 0:
        return 0.0, {}
    rows, cols = linear_sum_assignment(c.T)  # targets x preds
    # rows: target indices (in compacted space), cols: pred indices
    return c.T[rows, cols].sum(), dict(zip(np.where(valid)[0][rows], cols))


def test_matches_scipy_random():
    rng = np.random.default_rng(42)
    for trial in range(50):
        n = rng.integers(2, 14)
        m = rng.integers(1, min(n, 8) + 1)
        cost = rng.normal(size=(n, m)).astype(np.float32)
        valid = rng.random(m) < 0.7
        if valid.sum() > n:
            valid[:] = False

        t2p, total = solve_lap(jnp.asarray(cost), jnp.asarray(valid))
        t2p, total = np.asarray(t2p), float(total)

        ref_total, ref_map = scipy_cost(cost, valid)
        assert abs(total - ref_total) < 1e-4, (trial, total, ref_total)

        # returned assignment must be feasible and achieve the optimal cost
        matched = t2p[valid] if valid.any() else np.array([], dtype=int)
        assert (t2p[~valid] == -1).all()
        if valid.any():
            assert (matched >= 0).all()
            assert len(set(matched.tolist())) == len(matched)  # distinct preds
            achieved = sum(cost[p, t] for t, p in enumerate(t2p) if p >= 0)
            assert abs(achieved - ref_total) < 1e-4


def test_no_valid_targets():
    t2p, total = solve_lap(jnp.ones((5, 4)), jnp.zeros(4, dtype=bool))
    assert (np.asarray(t2p) == -1).all()
    assert float(total) == 0.0


def test_identity_cost():
    # Diagonal-dominant cost: target i should match pred i.
    cost = jnp.asarray(1.0 - np.eye(6, 3, dtype=np.float32))
    t2p, total = solve_lap(cost, jnp.ones(3, dtype=bool))
    np.testing.assert_array_equal(np.asarray(t2p), [0, 1, 2])
    assert abs(float(total)) < 1e-6


def test_batched():
    rng = np.random.default_rng(7)
    cost = rng.normal(size=(16, 10, 4)).astype(np.float32)
    valid = rng.random((16, 4)) < 0.6
    t2p, total = solve_lap_batch(jnp.asarray(cost), jnp.asarray(valid))
    for b in range(16):
        ref_total, _ = scipy_cost(cost[b], valid[b])
        assert abs(float(total[b]) - ref_total) < 1e-4


def test_forces_suboptimal_greedy():
    # Greedy (per-target argmin) fails here; Hungarian must swap.
    cost = jnp.asarray(np.array([[1.0, 2.0], [10.0, 4.0]], dtype=np.float32))
    # target0: pred0 cost1, pred1 cost10; target1: pred0 cost2, pred1 cost4
    t2p, total = solve_lap(cost, jnp.ones(2, dtype=bool))
    np.testing.assert_array_equal(np.asarray(t2p), [0, 1])
    assert abs(float(total) - 5.0) < 1e-6


# ------------------------------------------------- hypothesis properties
try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    @st.composite
    def lap_problem(draw):
        n = draw(st.integers(2, 13))
        m = draw(st.integers(1, min(n, 8)))
        # integer-ish costs maximise tie frequency (the adversarial case
        # for assignment solvers); scale some to float to mix magnitudes
        vals = st.one_of(
            st.integers(-3, 3).map(float),
            st.floats(-100, 100, allow_nan=False, width=32),
        )
        cost = draw(
            st.lists(st.lists(vals, min_size=m, max_size=m), min_size=n, max_size=n)
        )
        valid = draw(st.lists(st.booleans(), min_size=m, max_size=m))
        return np.array(cost, np.float32), np.array(valid, bool)

    @given(lap_problem())
    @settings(max_examples=60, deadline=None)
    def test_lap_optimal_cost_property(problem):
        """For every problem (ties, duplicate rows, negative costs,
        degenerate validity) the solver's assignment is feasible and its
        total equals scipy's optimum (model/box_utils.py:91 semantics)."""
        cost, valid = problem
        if valid.sum() > cost.shape[0]:  # infeasible: more targets than preds
            valid[:] = False
        t2p, total = solve_lap(jnp.asarray(cost), jnp.asarray(valid))
        t2p, total = np.asarray(t2p), float(total)
        ref_total, _ = scipy_cost(cost, valid)
        assert abs(total - ref_total) < 1e-3 * max(1.0, abs(ref_total))
        assert (t2p[~valid] == -1).all()
        if valid.any():
            matched = t2p[valid]
            assert (matched >= 0).all()
            assert len(set(matched.tolist())) == len(matched)
            achieved = sum(cost[p, t] for t, p in enumerate(t2p) if p >= 0)
            assert abs(achieved - ref_total) < 1e-3 * max(1.0, abs(ref_total))
