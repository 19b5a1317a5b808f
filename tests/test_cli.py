"""CLI end-to-end: drive the entry points' main() on synthetic fixtures.

Covers the arg plumbing (common.add_eval_args / build_eval_model) through
dataset construction, the jitted eval path and the result/similarity
dumps — the surface a user actually invokes (reference run/ scripts).
"""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_data import egoclip_fixture  # noqa: F401  (fixture re-export)


def test_cli_egomcq_end_to_end(egoclip_fixture, tmp_path):  # noqa: F811
    """cli.test_egomcq with a tiny backbone + --int8 + dumps."""
    from helping_hand_for_egocentric_videos_tpu.cli import test_egomcq

    meta, data = egoclip_fixture
    out = tmp_path / "res.json"
    sims = tmp_path / "sims.npz"
    test_egomcq.main(
        [
            "--meta_dir", str(meta),
            "--data_dir", str(data),
            "--backbone", "timesformer_tiny",
            "--num_queries", "4",
            "--int8",
            "--out", str(out),
            "--out_sims", str(sims),
        ]
    )
    res = json.loads(out.read_text())
    assert 0 <= res["Inter-video"] <= 100 and 0 <= res["Intra-video"] <= 100
    dump = np.load(sims)
    assert dump["sims"].shape[1] == 5  # 5 candidates per item
    assert len(dump["gt"]) == len(dump["types"]) == dump["sims"].shape[0]


def test_cli_egomcq_rejects_unknown_args(egoclip_fixture):  # noqa: F811
    from helping_hand_for_egocentric_videos_tpu.cli import test_egomcq

    with pytest.raises(SystemExit):
        test_egomcq.main(["--no_such_flag"])


def test_cli_extract_features_end_to_end(tmp_path):
    """cli.extract_features: sliding windows over .npy-backed videos ->
    per-video .npz feature sequences (MQ/NLQ-style extraction)."""
    import numpy as np

    from helping_hand_for_egocentric_videos_tpu.cli import extract_features

    rng = np.random.default_rng(0)
    data = tmp_path / "videos"
    data.mkdir()
    np.save(data / "a.mp4.npy", (rng.random((70, 16, 24, 3)) * 255).astype(np.uint8))
    np.save(data / "b.mp4.npy", (rng.random((40, 16, 24, 3)) * 255).astype(np.uint8))
    out = tmp_path / "feats"

    extract_features.main(
        [
            "--data_dir", str(data),
            "--out_dir", str(out),
            "--backbone", "timesformer_tiny",
            "--num_queries", "4",
            "--num_frames", "4",
            "--stride_sec", "1.0",
            "--fps", "30.0",
        ]
    )
    files = sorted(out.glob("*.features.npz"))
    assert len(files) == 2
    z = np.load(files[0], allow_pickle=True)
    # 70 frames, 4-frame windows, stride 30 -> starts 0, 30, 60 -> 3 windows
    assert z["features"].shape == (3, 256)
    assert list(z["starts"]) == [0.0, 1.0, 2.0]
    z2 = np.load(files[1], allow_pickle=True)
    assert z2["features"].shape == (2, 256)  # 40 frames -> starts 0, 30
