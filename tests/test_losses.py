"""Loss parity tests against independent numpy/scipy oracles.

Oracles re-derive the loss math from the formulas (dynamic-shape style,
with explicit row filtering and scipy matching) and are compared to the
fixed-shape masked jax implementations.
"""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment
from scipy.special import log_softmax

from helping_hand_for_egocentric_videos_tpu.losses import (
    box_set_loss,
    compute_box_loss,
    egonce_loss,
    egonce_multi_positive_loss,
    prepare_targets,
    word_contrastive_loss,
)

T = 0.07


# ---------------------------------------------------------------- EgoNCE
def np_egonce_single(x, mask_v, mask_n):
    n = x.shape[0]
    mask = (mask_v * mask_n + np.eye(n)) > 0
    ls = log_softmax(x / T, axis=1)
    li = np.mean(np.sum(ls * mask, 1) / mask.sum(1))
    ls_t = log_softmax(x.T / T, axis=1)
    lj = np.mean(np.sum(ls_t * mask.T, 1) / mask.sum(0))
    return -li - lj


def np_egonce_multi(x, mask_v, mask_n, pad_rows):
    rn, n = x.shape
    r = rn // n
    keep = pad_rows.astype(bool)
    mask = (
        np.repeat(mask_v * mask_n, r, 0) + np.repeat(np.eye(n), r, 0)
    ) * pad_rows[:, None]
    xk, maskk = x[keep], mask[keep] > 0
    ls = log_softmax(xk / T, axis=1)
    li = np.mean(np.sum(ls * maskk, 1) / maskk.sum(1))
    ls0 = log_softmax(xk / T, axis=0)
    lj = np.mean(np.sum(ls0 * maskk, 0) / maskk.sum(0))
    return -li - lj


def _tag_sim(rng, n, d):
    tags = (rng.random((n, d)) < 0.3).astype(np.float32)
    norm = np.maximum(np.linalg.norm(tags, axis=1, keepdims=True), 1e-8)
    t = tags / norm
    return t @ t.T


def test_egonce_single(rng):
    n = 8
    x = rng.normal(size=(n, n)).astype(np.float32) * 0.5
    sv, sn = _tag_sim(rng, n, 10), _tag_sim(rng, n, 20)
    got, mask = egonce_loss(jnp.asarray(x), jnp.asarray(sv), jnp.asarray(sn))
    want = np_egonce_single(x, sv, sn)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_egonce_single_diag_only(rng):
    n = 6
    x = rng.normal(size=(n, n)).astype(np.float32)
    got, _ = egonce_loss(jnp.asarray(x))
    want = np_egonce_single(x, np.zeros((n, n)), np.zeros((n, n)))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_egonce_multi_positive(rng):
    n, r = 6, 5
    x = rng.normal(size=(n * r, n)).astype(np.float32) * 0.5
    sv, sn = _tag_sim(rng, n, 10), _tag_sim(rng, n, 20)
    # primary caption (rephrase 0) always valid; others randomly padded
    pad = (rng.random(n * r) < 0.6).astype(np.float32)
    pad[::r] = 1.0
    got, _ = egonce_multi_positive_loss(
        jnp.asarray(x), jnp.asarray(sv), jnp.asarray(sn), jnp.asarray(pad)
    )
    want = np_egonce_multi(x, sv, sn, pad)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_egonce_multi_all_valid(rng):
    n, r = 4, 5
    x = rng.normal(size=(n * r, n)).astype(np.float32)
    sv, sn = _tag_sim(rng, n, 8), _tag_sim(rng, n, 8)
    pad = np.ones(n * r, dtype=np.float32)
    got, _ = egonce_multi_positive_loss(
        jnp.asarray(x), jnp.asarray(sv), jnp.asarray(sn), jnp.asarray(pad)
    )
    np.testing.assert_allclose(float(got), np_egonce_multi(x, sv, sn, pad), rtol=1e-4)


# ---------------------------------------------------------------- box loss
def np_cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def np_giou(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    iou = inter / (union + 1e-4)
    lt = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def np_box_loss(pred, raw_xyxy, resize=224.0):
    """Oracle: scipy matching, dynamic shapes."""
    B = pred.shape[0]
    total_l1, total_giou, num_boxes = 0.0, 0.0, 0
    per_sample = []
    for i in range(B):
        t = np.clip(raw_xyxy[i], 0, resize) / resize
        valid = (t[:, 2] > t[:, 0]) & (t[:, 3] > t[:, 1])
        t = t[valid]
        cxcy = np.stack(
            [(t[:, 0] + t[:, 2]) / 2, (t[:, 1] + t[:, 3]) / 2, t[:, 2] - t[:, 0], t[:, 3] - t[:, 1]],
            -1,
        )
        per_sample.append(cxcy)
        num_boxes += len(cxcy)
    num_boxes = max(num_boxes, 1)
    for i in range(B):
        t = per_sample[i]
        if len(t) == 0:
            continue
        p = pred[i]
        cost_l1 = np.abs(p[:, None] - t[None]).sum(-1)
        cost_giou = -np_giou(np_cxcywh_to_xyxy(p), np_cxcywh_to_xyxy(t))
        c = 5 * cost_l1 + 2 * cost_giou
        rows, cols = linear_sum_assignment(c)
        mp, mt = p[rows], t[cols]
        total_l1 += np.abs(mp - mt).sum()
        g = np_giou(np_cxcywh_to_xyxy(mp), np_cxcywh_to_xyxy(mt))
        total_giou += (1 - np.diag(g)).sum()
    return total_l1 / num_boxes, total_giou / num_boxes


def test_box_set_loss_matches_oracle(rng):
    B, Q, M = 8, 10, 2
    pred = rng.random((B, Q, 4)).astype(np.float32) * 0.5 + 0.25
    raw = rng.random((B, M, 4)).astype(np.float32) * 224
    raw = np.concatenate(
        [np.minimum(raw[..., :2], raw[..., 2:]), np.maximum(raw[..., :2], raw[..., 2:]) + 5],
        -1,
    )
    raw[rng.random((B, M)) < 0.3] = 0.0  # absent boxes

    tgt, valid = prepare_targets(jnp.asarray(raw))
    out = box_set_loss(jnp.asarray(pred), tgt, valid)
    l1_ref, giou_ref = np_box_loss(pred, raw)
    np.testing.assert_allclose(float(out["loss_bbox"]), l1_ref, rtol=1e-4)
    np.testing.assert_allclose(float(out["loss_giou"]), giou_ref, rtol=1e-4)


def test_compute_box_loss_weighting(rng):
    B, Q = 4, 13
    pred = rng.random((B, Q, 4)).astype(np.float32) * 0.5 + 0.25
    raw = np.zeros((B, 2, 4), dtype=np.float32)
    raw[:, 0] = [10, 10, 100, 100]
    total, out = compute_box_loss("hand_boxes", jnp.asarray(pred), jnp.asarray(raw), num_queries=12)
    l1_ref, giou_ref = np_box_loss(pred[:, 0:2], raw)
    np.testing.assert_allclose(float(total), 0.75 * (5 * l1_ref + 2 * giou_ref), rtol=1e-4)
    # obj split uses queries 2:12
    total_o, _ = compute_box_loss("obj_boxes", jnp.asarray(pred), jnp.asarray(raw), num_queries=12)
    l1_o, giou_o = np_box_loss(pred[:, 2:12], raw)
    np.testing.assert_allclose(float(total_o), 0.75 * (5 * l1_o + 2 * giou_o), rtol=1e-4)


def test_box_loss_all_empty(rng):
    pred = rng.random((3, 5, 4)).astype(np.float32) * 0.5 + 0.25
    raw = np.zeros((3, 2, 4), dtype=np.float32)
    total, out = compute_box_loss("all_boxes", jnp.asarray(pred), jnp.asarray(raw))
    assert float(total) == 0.0
    assert float(out["num_boxes"]) == 1.0


# ----------------------------------------------------- word contrastive
def np_word_loss(noun_embeds, preds, gt_inds, thr=0.6):
    def norm(a):
        return a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-8)

    ne, losses = norm(noun_embeds), []
    noun_sim = ne @ ne.T
    np.fill_diagonal(noun_sim, 0)
    for i in range(preds.shape[0]):
        inds = gt_inds[i][gt_inds[i] != 0]
        if len(inds) == 0:
            continue
        gt = norm(noun_embeds[inds])
        pr = norm(preds[i])
        cost = -(gt @ pr.T)
        rows, cols = linear_sum_assignment(cost)
        sel = norm(preds[i][cols])
        sim_all = sel @ ne.T
        mask = noun_sim[inds[rows]] > thr
        logits = np.where(mask, -1.0, sim_all) / T
        lp = log_softmax(logits, axis=-1)
        losses.extend(-lp[np.arange(len(inds)), inds[rows]])
    return float(np.mean(losses))


def test_word_contrastive_matches_oracle(rng):
    V, B, Q, M, E = 30, 6, 12, 4, 16
    noun_embeds = rng.normal(size=(V, E)).astype(np.float32)
    preds = rng.normal(size=(B, Q, E)).astype(np.float32)
    gt = rng.integers(0, V, size=(B, M)).astype(np.int32)
    gt[rng.random((B, M)) < 0.4] = 0
    got = word_contrastive_loss(
        jnp.asarray(noun_embeds), jnp.asarray(preds), jnp.asarray(gt)
    )
    want = np_word_loss(noun_embeds, preds, gt)
    np.testing.assert_allclose(float(got), want, rtol=1e-3)


def test_single_query_mode_box_loss(rng):
    """nq==1 mode: one query decodes n_decode boxes per frame; the box loss
    consumes them as 'all_boxes' with n_queries=10 (run/train.py:164,
    tfm_decoder.py:135-139)."""
    import jax
    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        decoder_forward,
        init_decoder_params,
    )

    cfg = DecoderConfig(
        d_model=32, nhead=4, num_layers=2, dim_feedforward=64, num_queries=1,
        num_classes=4, feature_dim=48, num_frames=2, patches_per_frame=4,
        n_decode=10,
    )
    params = init_decoder_params(jax.random.PRNGKey(11), cfg)
    feats = jnp.asarray(rng.normal(size=(2, 2, 4, 48)).astype(np.float32))
    out = decoder_forward(params, cfg, feats)
    assert out.pred_boxes.shape == (4, 10, 4)  # B*T rows, n_decode boxes

    raw = np.zeros((4, 4, 4), np.float32)
    raw[:, 0] = [10, 10, 100, 100]
    raw[:, 2] = [50, 50, 150, 160]
    total, aux = compute_box_loss("all_boxes", out.pred_boxes, jnp.asarray(raw))
    assert np.isfinite(float(total))
    assert float(aux["num_boxes"]) == 8.0  # 2 valid boxes x 4 frame-rows


def _np_egonce_multi_masked(x, tag_mask, pad_rows):
    """Oracle for the single-mask / no-mask branches (loss.py:25-56 with
    mask_sim_v or mask_sim_n alone / neither)."""
    rn, n = x.shape
    r = rn // n
    keep = pad_rows.astype(bool)
    base = np.repeat(np.eye(n), r, 0)
    if tag_mask is not None:
        base = base + np.repeat(tag_mask, r, 0)
    mask = base * pad_rows[:, None]
    xk, maskk = x[keep], mask[keep] > 0
    ls = log_softmax(xk / T, axis=1)
    li = np.mean(np.sum(ls * maskk, 1) / maskk.sum(1))
    ls0 = log_softmax(xk / T, axis=0)
    lj = np.mean(np.sum(ls0 * maskk, 0) / maskk.sum(0))
    return -li - lj


def test_egonce_multi_positive_single_mask_and_no_mask(rng):
    """mask_n-only, mask_v-only and diagonal-only multi-positive modes."""
    n, r = 5, 3
    x = rng.normal(size=(n * r, n)).astype(np.float32) * 0.5
    sv, sn = _tag_sim(rng, n, 10), _tag_sim(rng, n, 16)
    pad = (rng.random(n * r) < 0.7).astype(np.float32)
    pad[::r] = 1.0

    got_n, _ = egonce_multi_positive_loss(
        jnp.asarray(x), None, jnp.asarray(sn), jnp.asarray(pad)
    )
    np.testing.assert_allclose(float(got_n), _np_egonce_multi_masked(x, sn, pad), rtol=1e-4)

    got_v, _ = egonce_multi_positive_loss(
        jnp.asarray(x), jnp.asarray(sv), None, jnp.asarray(pad)
    )
    np.testing.assert_allclose(float(got_v), _np_egonce_multi_masked(x, sv, pad), rtol=1e-4)

    got_0, mask0 = egonce_multi_positive_loss(
        jnp.asarray(x), None, None, jnp.asarray(pad)
    )
    np.testing.assert_allclose(float(got_0), _np_egonce_multi_masked(x, None, pad), rtol=1e-4)
    # diagonal-only positives: row i*? -> video i, only where the row is valid
    want_mask = (np.repeat(np.eye(n), r, 0) * pad[:, None]) > 0
    np.testing.assert_array_equal(np.asarray(mask0), want_mask)


def test_egonce_multi_positive_2d_pad_mask(rng):
    """The reference passes a (R*N, N) row-constant pad mask
    (run/train.py:144-145); 1-D and 2-D forms must agree."""
    n, r = 4, 3
    x = rng.normal(size=(n * r, n)).astype(np.float32)
    sv, sn = _tag_sim(rng, n, 8), _tag_sim(rng, n, 8)
    pad = (rng.random(n * r) < 0.6).astype(np.float32)
    pad[::r] = 1.0
    got1, _ = egonce_multi_positive_loss(
        jnp.asarray(x), jnp.asarray(sv), jnp.asarray(sn), jnp.asarray(pad)
    )
    pad2d = np.broadcast_to(pad[:, None], (n * r, n)).copy()
    got2, _ = egonce_multi_positive_loss(
        jnp.asarray(x), jnp.asarray(sv), jnp.asarray(sn), jnp.asarray(pad2d)
    )
    np.testing.assert_allclose(float(got1), float(got2), rtol=1e-6)
