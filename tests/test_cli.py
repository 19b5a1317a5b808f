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
