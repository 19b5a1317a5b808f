"""Metric golden tests, anchored by the reference's own nDCG self-test value."""

import numpy as np
import jax.numpy as jnp

from helping_hand_for_egocentric_videos_tpu.metrics import (
    calculate_DCG,
    calculate_IDCG,
    calculate_k_counts,
    calculate_nDCG,
    calculate_mAP,
    cols2metrics,
    egomcq_accuracy_metrics,
    egomcq_accuracy_by_type,
    t2v_metrics,
    v2t_metrics,
    sim_matrix,
    mean_class_accuracy,
    topk_accuracy,
)


SIM = np.array(
    [[1.0, 0.7, 0.4, 0.0], [0.3, 0.9, 0.6, 0.1], [0.2, 0.5, 0.8, 0.4]]
)
REL = np.array(
    [[1.0, 0.5, 0.25, 0.0], [0.0, 1.0, 0.4, 0.0], [0.5, 0.3, 1.0, 0.0]]
)


def test_ndcg_golden():
    # Golden value published by the reference's inline self-test
    # (utils/nDCG.py:136-164).
    k = np.array([[1, 1, 1, 0], [1, 1, 0, 0], [1, 1, 1, 0]])
    assert (k == calculate_k_counts(REL)).all()
    ndcg = calculate_nDCG(SIM, REL, k)
    assert abs(ndcg - 0.9371789900735429) < 1e-12
    dcg = calculate_DCG(SIM, REL, k)
    idcg = calculate_IDCG(REL, k)
    assert ndcg == np.mean(dcg / idcg)
    per_query = calculate_nDCG(SIM, REL, k, IDCG=idcg, reduction=None)
    assert np.mean(per_query) == ndcg


def test_map_perfect_and_worst():
    rel = np.array([[1, 0, 0], [0, 1, 0]])
    sim_perfect = np.array([[0.9, 0.1, 0.0], [0.0, 0.9, 0.1]])
    assert calculate_mAP(sim_perfect, rel) == 1.0
    sim_worst = np.array([[0.0, 0.5, 0.9], [0.9, 0.0, 0.5]])
    # relevant item retrieved last -> AP = 1/3 each
    np.testing.assert_allclose(calculate_mAP(sim_worst, rel), 1 / 3)


def test_map_handchecked():
    # Single query, rel items at ranks 1 and 3: AP = (1/1 + 2/3)/2.
    sim = np.array([[0.9, 0.8, 0.7]])
    rel = np.array([[1, 0, 1]])
    np.testing.assert_allclose(calculate_mAP(sim, rel), (1.0 + 2 / 3) / 2)


def test_cols2metrics():
    m = cols2metrics(np.array([0, 1, 4, 9, 60]), 5)
    assert m["R1"] == 20.0 and m["R5"] == 60.0 and m["R10"] == 80.0
    assert m["R50"] == 80.0
    assert m["MedR"] == 5.0  # median rank 4 (0-idx) + 1


def test_t2v_identity():
    sims = np.eye(4) + 0.01 * np.arange(16).reshape(4, 4)
    m = t2v_metrics(sims)
    assert m["R1"] == 100.0


def test_t2v_multi_caption():
    # 4 captions, 2 videos (2 captions per video).
    sims = np.array([[0.9, 0.1], [0.2, 0.5], [0.3, 0.8], [0.7, 0.4]])
    # caption 0 -> video 0 rank0; caption 1 -> video 0: 0.2 < 0.5 rank 1;
    # caption 2 -> video 1 rank 0; caption 3 -> video 1: 0.4 < 0.7 rank 1
    m = t2v_metrics(sims)
    assert m["R1"] == 50.0 and m["R5"] == 100.0


def test_v2t_min_rank():
    sims = np.array([[0.9, 0.1], [0.2, 0.5], [0.3, 0.8], [0.7, 0.4]]).T
    # wait: v2t expects (texts, videos) and transposes internally.
    m = v2t_metrics(sims.T)
    assert m["R1"] == 100.0  # each video's best caption ranks first


def test_egomcq_accuracy():
    preds = np.array([[0.9, 0.1, 0, 0, 0], [0, 0.8, 0.1, 0, 0], [0.5, 0.2, 0, 0, 0]])
    labels = np.array([0, 0, 0])
    types = np.array([1, 1, 2])
    by_type = egomcq_accuracy_by_type(preds, labels, types)
    assert by_type[1] == 50.0 and by_type[2] == 100.0
    named = egomcq_accuracy_metrics(preds, labels, types)
    # reference mapping: sorted types -> [Intra, Inter]
    assert named["Intra-video"] == 50.0 and named["Inter-video"] == 100.0


def test_egomcq_accuracy_single_type_subset_labels_stably():
    """A limited eval subset can contain only one MCQ type; the fixed
    {1: Intra, 2: Inter} mapping (replicating the reference's swapped
    naming for the 2-type case) must still label it correctly — the
    reference's positional zip would call a type-2-only subset
    'Intra-video' and zero the best-model criterion."""
    preds = np.array([[0.9, 0.1, 0, 0, 0], [0, 0.8, 0, 0, 0]])
    labels = np.array([0, 1])
    only2 = egomcq_accuracy_metrics(preds, labels, np.array([2, 2]))
    assert only2 == {"Inter-video": 100.0}
    only1 = egomcq_accuracy_metrics(preds, labels, np.array([1, 1]))
    assert only1 == {"Intra-video": 100.0}
    unknown = egomcq_accuracy_metrics(preds, labels, np.array([1, 7]))
    assert set(unknown) == {"Intra-video", "type7"}


def test_sim_matrix_cosine():
    a = np.array([[3.0, 0.0], [0.0, 5.0]])
    b = np.array([[1.0, 0.0], [1.0, 1.0]])
    s = np.asarray(sim_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(
        s, [[1.0, np.sqrt(0.5)], [0.0, np.sqrt(0.5)]], atol=1e-6
    )
    raw = np.asarray(sim_matrix(jnp.asarray(a), jnp.asarray(b), norm=False))
    np.testing.assert_allclose(raw, a @ b.T, atol=1e-6)


def test_classification_metrics():
    preds = np.array([0, 1, 1, 2])
    labels = np.array([0, 1, 2, 2])
    mca, top1 = mean_class_accuracy(preds, labels, 3)
    np.testing.assert_allclose(mca, 100 * (1 + 1 + 0.5) / 3)
    np.testing.assert_allclose(top1, 75.0)
    scores = np.array([[0.9, 0.05, 0.05], [0.1, 0.2, 0.7]])
    top1_, top2_ = topk_accuracy(scores, np.array([0, 1]), ks=(1, 2))
    assert top1_ == 50.0 and top2_ == 100.0


def test_path_vis_grid_colors():
    """visualise_path semantics (reference utils/visualisation.py:8-38):
    GT cells blue, predictions green on GT / red off GT, NaN cells grey."""
    import numpy as np

    from helping_hand_for_egocentric_videos_tpu.utils.path_vis import (
        batch_path_vis,
        visualise_path,
    )

    window = np.ones((3, 4), np.float32)
    window[0, 3] = np.nan
    target = [(0, 0), (1, 1), (2, 2)]
    pred = [(0, 0), (1, 2)]  # hit on (0,0), miss at (1,2)
    g = visualise_path(pred, target, window)
    assert g.shape == (3, 3, 4)
    np.testing.assert_allclose(g[:, 0, 0] * 255, (64, 191, 64))  # TP green
    np.testing.assert_allclose(g[:, 1, 2] * 255, (191, 64, 64))  # FP red
    np.testing.assert_allclose(g[:, 1, 1] * 255, (102, 153, 255))  # GT blue
    np.testing.assert_allclose(g[:, 0, 3] * 255, (130, 130, 130))  # NaN grey
    np.testing.assert_allclose(g[:, 2, 3] * 255, (255, 255, 255))  # empty

    batch = batch_path_vis({"dtw": pred, "min_dist": pred}, target, window)
    assert batch.shape == (2, 3, 3, 4)
    # min_dist ignores the validity window
    np.testing.assert_allclose(batch[1][:, 0, 3] * 255, (255, 255, 255))

    # a prediction on a clip row with no GT cell is skipped, not a crash
    g2 = visualise_path([(5, 0), (0, 0)], target, window)
    np.testing.assert_allclose(g2[:, 0, 0] * 255, (64, 191, 64))


def test_t2v_ties_keep_first_rank():
    """Tied ground-truth distances keep the first (best) rank per query
    (model/metric.py:76-92 tie handling)."""
    # video 1's caption ties with video 0's column: two zero-distance hits
    sims = np.array(
        [
            [1.0, 0.2, 0.1],
            [0.8, 0.8, 0.0],  # tie: gt dist -0.8 appears at ranks 0 and 1
            [0.0, 0.1, 0.9],
        ]
    )
    m = t2v_metrics(sims)
    assert m["R1"] == 100.0  # the tie resolves optimistically to rank 0
    assert m["MedR"] == 1.0


def test_t2v_query_masks_filter_queries():
    """query_masks drop padded captions from the rank pool
    (model/metric.py:94-100 semantics)."""
    sims = np.array(
        [
            [0.9, 0.1, 0.0],
            [0.0, 0.1, 0.2],  # bad query: its own video ranks last
            [0.1, 0.0, 0.8],
        ]
    )
    full = t2v_metrics(sims)
    masked = t2v_metrics(sims, query_masks=np.array([1, 0, 1]))
    assert full["R1"] < 100.0 and masked["R1"] == 100.0


def test_v2t_query_masks_exclude_captions():
    """v2t with masked captions: excluded captions can neither win nor
    compete (model/metric.py:128-170 missing_val semantics)."""
    # caps 0,1 belong to vid 0; caps 2,3 to vid 1
    sims = np.array(
        [
            [0.1, 0.2],
            [0.95, 0.1],
            [0.3, 0.0],
            [0.0, 0.99],
        ]
    )
    full = v2t_metrics(sims)
    assert full["R1"] == 100.0  # cap 1 wins for vid 0, cap 3 for vid 1
    # mask out each video's best caption: vid 0 falls back to cap 0
    masked = v2t_metrics(sims, query_masks=np.array([1, 0, 1, 1]))
    assert masked["R1"] < full["R1"]


def test_v2t_tied_distances_average_rank():
    """Tied caption distances contribute their average rank (VSE style)."""
    sims = np.array(
        [
            [0.5, 0.0],
            [0.0, 0.0],
            [0.5, 0.0],  # caps 0, 2, 3 tie at the top for vid 0
            [0.5, 0.9],
        ]
    )
    m = v2t_metrics(sims)
    # vid 0: its best cap (0) sits in a 3-way tie -> mean rank 1.0 (R1 miss);
    # vid 1: its cap 3 wins outright (rank 0)
    assert m["R1"] == 50.0 and m["R5"] == 100.0
