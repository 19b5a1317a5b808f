"""Randomized property tests: fixed-shape loss/matching implementations
vs dynamic-shape oracles across many configurations."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment
from scipy.special import log_softmax

from helping_hand_for_egocentric_videos_tpu.losses import egonce_multi_positive_loss
from helping_hand_for_egocentric_videos_tpu.ops.lap import solve_lap


def test_egonce_fuzz():
    rng = np.random.default_rng(123)
    for trial in range(20):
        n = int(rng.integers(2, 10))
        r = int(rng.integers(1, 6))
        x = rng.normal(size=(n * r, n)).astype(np.float32)
        tags_v = (rng.random((n, 7)) < 0.4).astype(np.float32)
        tags_n = (rng.random((n, 9)) < 0.4).astype(np.float32)

        def cos(t):
            nn = np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-8)
            t = t / nn
            return t @ t.T

        sv, sn = cos(tags_v), cos(tags_n)
        pad = (rng.random(n * r) < 0.7).astype(np.float32)
        pad[::r] = 1.0  # primary always valid

        got, _ = egonce_multi_positive_loss(
            jnp.asarray(x), jnp.asarray(sv), jnp.asarray(sn), jnp.asarray(pad)
        )

        keep = pad.astype(bool)
        mask = (np.repeat(sv * sn, r, 0) + np.repeat(np.eye(n), r, 0)) * pad[:, None]
        xk, mk = x[keep], mask[keep] > 0
        ls = log_softmax(xk / 0.07, axis=1)
        li = np.mean(np.sum(ls * mk, 1) / mk.sum(1))
        ls0 = log_softmax(xk / 0.07, axis=0)
        lj = np.mean(np.sum(ls0 * mk, 0) / np.maximum(mk.sum(0), 1))
        want = -li - lj
        np.testing.assert_allclose(float(got), want, rtol=2e-4, atol=1e-5), trial


def test_lap_fuzz_with_ties():
    rng = np.random.default_rng(7)
    for trial in range(40):
        n = int(rng.integers(1, 14))
        m = int(rng.integers(1, min(n, 10) + 1))
        # quantized costs -> many ties
        cost = np.round(rng.normal(size=(n, m)) * 2) / 2
        cost = cost.astype(np.float32)
        valid = rng.random(m) < 0.8
        if valid.sum() > n:
            valid[:] = False
        t2p, total = solve_lap(jnp.asarray(cost), jnp.asarray(valid))
        t2p = np.asarray(t2p)
        if valid.any():
            rows, cols = linear_sum_assignment(cost[:, valid].T)
            ref = cost[:, valid].T[rows, cols].sum()
            np.testing.assert_allclose(float(total), ref, atol=1e-4)
            # feasibility
            matched = t2p[valid]
            assert (matched >= 0).all()
            assert len(set(matched.tolist())) == len(matched)
        else:
            assert float(total) == 0.0
