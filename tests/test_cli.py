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


def _epic_fixture(tmp_path):
    """Miniature EPIC-100 retrieval layout (meta + npy-backed videos)."""
    import pickle

    import pandas as pd
    import torch

    rng = np.random.default_rng(0)
    meta = tmp_path / "epic_meta"
    data = tmp_path / "epic_data"
    (meta / "retrieval_annotations").mkdir(parents=True)
    (meta / "relevancy").mkdir()

    n = 4
    rows = []
    for i in range(n):
        rows.append(
            {
                "narration_id": f"P01_01_{i}",
                "participant_id": "P01",
                "video_id": "P01_01",
                "narration_timestamp": "00:00:00.00",
                "start_timestamp": f"00:00:{i:02d}.00",
                "stop_timestamp": f"00:00:{i + 1:02d}.50",
                "start_frame": i * 30,
                "stop_frame": (i + 1) * 30,
                "narration": f"take plate {i}",
            }
        )
    pd.DataFrame(rows).to_csv(
        meta / "retrieval_annotations" / "EPIC_100_retrieval_test.csv", index=False
    )
    pd.DataFrame(
        {"narration_id": [r["narration_id"] for r in rows],
         "sentence": [r["narration"] for r in rows]}
    ).to_csv(
        meta / "retrieval_annotations" / "EPIC_100_retrieval_test_sentence.csv",
        index=False,
    )
    with open(meta / "relevancy" / "caption_relevancy_EPIC_100_retrieval_test.pkl", "wb") as f:
        pickle.dump(np.eye(n, n).astype(np.float32), f)
    with open(meta / "indexes.pkl", "wb") as f:
        pickle.dump(np.arange(n), f)

    vdir = data / "P01"
    vdir.mkdir(parents=True)
    np.save(vdir / "P01_01.MP4.npy", (rng.random((200, 16, 24, 3)) * 255).astype(np.uint8))
    video_fp = str(data / "P01" / "P01_01.MP4")
    torch.save({video_fp: 30.0}, str(meta / "fps_dict_256.pth"))
    return str(meta), str(data)


def test_cli_epic_end_to_end(tmp_path):
    """cli.test_epic on a miniature EPIC layout: dataset parsing (timestamps,
    fps dict, relevancy/indexes), harness, metric output and dumps."""
    import json

    from helping_hand_for_egocentric_videos_tpu.cli import test_epic

    meta, data = _epic_fixture(tmp_path)
    out = tmp_path / "epic.json"
    test_epic.main(
        [
            "--meta_dir", meta,
            "--data_dir", data,
            "--backbone", "timesformer_tiny",
            "--num_queries", "4",
            "--num_frames", "4",
            "--batch_size", "2",
            "--out", str(out),
        ]
    )
    res = json.loads(out.read_text())
    for k in ("mAP_AVG", "nDCG_AVG"):
        assert 0 <= res[k] <= 1.0001


def _egtea_fixture(tmp_path):
    """Miniature EGTEA layout: splits, action_idx, len_dict, npy clips."""
    import torch

    rng = np.random.default_rng(1)
    meta = tmp_path / "egtea_meta"
    data = tmp_path / "egtea_clips"
    meta.mkdir()
    (meta / "action_idx.txt").write_text("Open_Drawer 1\nCut_Onion 2\n")
    clips = ["OP01-R01-Pasta-100", "OP01-R01-Pasta-101", "OP02-R02-Salad-7"]
    labels = [1, 2, 1]
    (meta / "test_split1.txt").write_text(
        "\n".join(f"{c} {l}" for c, l in zip(clips, labels)) + "\n"
    )
    len_dict = {}
    for c in clips:
        vid = "-".join(c.split("-")[:3])
        d = data / vid
        d.mkdir(parents=True, exist_ok=True)
        n = 24
        np.save(d / f"{c}.mp4.npy", (rng.random((n, 16, 24, 3)) * 255).astype(np.uint8))
        len_dict[str(data / vid / f"{c}.mp4")] = n
    torch.save({"len_dict": len_dict}, str(meta / "egtea_video_list.pth.tar"))
    return str(meta), str(data)


def test_cli_egtea_end_to_end(tmp_path):
    """cli.test_egtea on a miniature EGTEA layout incl. --spatial_crops 3."""
    import json

    from helping_hand_for_egocentric_videos_tpu.cli import test_egtea

    meta, data = _egtea_fixture(tmp_path)
    out = tmp_path / "egtea.json"
    test_egtea.main(
        [
            "--meta_dir", meta,
            "--data_dir", data,
            "--backbone", "timesformer_tiny",
            "--num_queries", "4",
            "--num_frames", "4",
            "--num_clips", "2",
            "--splits", "1",
            "--spatial_crops", "3",
            "--out", str(out),
        ]
    )
    res = json.loads(out.read_text())
    assert 0 <= res["mean_class_acc"] <= 100 and 0 <= res["top1"] <= 100


def test_cli_train_end_to_end(egoclip_fixture, tmp_path):  # noqa: F811
    """cli.train arg plumbing through two real steps on the fixture."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices (virtual CPU mesh)")
    import torch

    from helping_hand_for_egocentric_videos_tpu.cli import train as train_cli

    meta, data = egoclip_fixture
    # the shared fixture's noun embeddings are 16-wide (tiny_models text
    # tower); the CLI builds timesformer_tiny whose text width is 64
    torch.save(
        {"pad": torch.zeros(64), "drawer": torch.ones(64), "knife": torch.full((64,), 2.0)},
        f"{meta}/noun_dict_lavila_embeds.pth",
    )
    train_cli.main(
        [
            "--name", "clismoke",
            "--output_dir", str(tmp_path / "runs"),
            "--meta_dir", meta,
            "--data_dir", data,
            "--backbone", "timesformer_tiny",
            "--batch_size", "2",
            "--num_workers", "2",
            "--epochs", "1",
            "--max_steps", "2",
            "--eval_freq", "100",
            "--runtime_save_iter", "100",
            "--set", "data.input_res=224", "parallel.backbone_dtype=float32",
            "parallel.num_devices=2",  # global batch (pos+neg=4) must divide
        ]
    )
    exp = tmp_path / "runs" / "clismoke"
    assert (exp / "running_config.json").exists()
    assert (exp / "train_metrics.jsonl").exists()


def test_cli_visualize_end_to_end(tmp_path):
    """cli.visualize: decode a clip, draw predicted hand/object boxes and
    cross-attention heatmaps to out_dir."""
    from helping_hand_for_egocentric_videos_tpu.cli import visualize

    rng = np.random.default_rng(0)
    np.save(tmp_path / "0.mp4.npy", (rng.random((90, 32, 48, 3)) * 255).astype(np.uint8))
    out = tmp_path / "vis"
    visualize.main(
        [
            "--clip", str(tmp_path / "0.mp4"),
            "--backbone", "timesformer_tiny",
            "--num_queries", "4",
            "--start", "0.0",
            "--end", "1.0",
            "--out_dir", str(out),
            "--attn",
        ]
    )
    pngs = list(out.glob("**/*.png")) + list(out.glob("**/*.jpg"))
    assert pngs, list(out.rglob("*"))


def test_cli_parity_check_end_to_end(egoclip_fixture, tmp_path):  # noqa: F811
    """cli.parity_check: EgoMCQ + Epic + EGTEA harnesses, int8 diff,
    target gate, PARITY_REPORT.json."""
    from helping_hand_for_egocentric_videos_tpu.cli import parity_check

    meta, data = egoclip_fixture
    epic_meta, epic_data = _epic_fixture(tmp_path)
    egtea_meta, egtea_data = _egtea_fixture(tmp_path)
    targets = tmp_path / "targets.json"
    targets.write_text(json.dumps({
        "egomcq.Inter-video": 50.0,       # gated with a huge tol -> pass
        "epic.mAP_AVG": 999.0,            # impossible target -> fail
        "egtea.mean_class_acc": 10.0,     # gated with a huge tol -> pass
        "egtea.missing_metric": 1.0,      # metric never produced -> fail+note
    }))
    out_dir = tmp_path / "rep"
    rep = parity_check.main(
        [
            "--egomcq_meta", meta,
            "--egomcq_data", data,
            "--epic_meta", epic_meta,
            "--epic_data", epic_data,
            "--egtea_meta", egtea_meta,
            "--egtea_data", egtea_data,
            "--egtea_splits", "1",
            "--egtea_num_clips", "2",
            "--backbone", "timesformer_tiny",
            "--num_queries", "4",
            "--egomcq_frames", "4",
            "--epic_frames", "4",
            "--egtea_frames", "4",
            "--int8_diff",
            "--targets", str(targets),
            "--tol", "100",
            "--out_dir", str(out_dir),
        ]
    )
    on_disk = json.loads((out_dir / "PARITY_REPORT.json").read_text())
    assert on_disk == rep
    assert set(rep["metrics"]) == {"egomcq", "epic", "egtea"}
    assert 0 <= rep["metrics"]["egomcq"]["Inter-video"] <= 100
    assert "mAP_AVG" in rep["metrics"]["epic"]
    assert 0 <= rep["metrics"]["egtea"]["mean_class_acc"] <= 100
    assert len(rep["metrics"]["egtea"]["splits"]) == 1
    # int8 ran and the dumps were diffed with the rank-stability gate
    assert set(rep["int8_agreement"]) == {"egomcq", "epic"}
    for ag in rep["int8_agreement"].values():
        assert 0.0 <= ag["argmax_agreement"] <= 1.0
        assert -1.0 <= ag["spearman"] <= 1.0
        assert isinstance(ag["pass"], bool)
    assert rep["int8_certified"] == all(
        a["pass"] for a in rep["int8_agreement"].values()
    )
    # the target gate: pass, numeric fail, and missing-metric fail
    assert rep["gate"]["egomcq.Inter-video"]["pass"]
    assert not rep["gate"]["epic.mAP_AVG"]["pass"]
    assert rep["gate"]["egtea.mean_class_acc"]["pass"]
    assert rep["gate"]["egtea.missing_metric"]["note"] == "metric not produced"
    assert rep["certified"] is False
    # sim dumps exist for offline inspection
    assert (out_dir / "egomcq_sims_f32.npz").exists()
    assert (out_dir / "epic_sims_int8.npz").exists()


def test_cli_doctor_reports_usable_env(capsys):
    """cli.doctor: full environment report on a healthy backend, and the
    timeout guard turns a hung device probe into a report, not a hang."""
    from helping_hand_for_egocentric_videos_tpu.cli import doctor

    rc = doctor.main(["--timeout", "60"])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0 and rep["usable"] is True
    assert rep["devices"] and rep["device_smoke"] == "ok"
    assert rep["bpe_vocab"] is True
    assert "npy" in rep["decode_backends"]

    import time

    ok, msg = doctor._with_timeout(lambda: time.sleep(30), 0.2)
    assert not ok and "no response" in msg
    ok, val = doctor._with_timeout(lambda: 7, 5)
    assert ok and val == 7
    ok, msg = doctor._with_timeout(lambda: 1 / 0, 5)
    assert not ok and "ZeroDivisionError" in msg


def test_doctor_released_weights_precondition(tmp_path, monkeypatch):
    """The parity gate's machine-readable precondition (VERDICT r3 item 4):
    absent weights -> blocked_on names the exact files; present weights ->
    parity_gate_ready with md5 provenance and the one-command run line."""
    from helping_hand_for_egocentric_videos_tpu.cli import doctor

    monkeypatch.setenv("HH_WEIGHTS", str(tmp_path))
    monkeypatch.delenv("HH_CLIP_CACHE", raising=False)
    rep = doctor.released_weights_report()
    assert rep["parity_gate_ready"] is False
    assert (
        "clip_openai_timesformer_large.narrator_rephraser.ep_0003."
        "md5sum_c89337.pth" in rep["blocked_on"]
    )
    assert "helping-hand-ckpt-nq12.pth.tar" in rep["blocked_on"]

    for spec in doctor.RELEASED_WEIGHTS[:2]:
        (tmp_path / spec["file"]).write_bytes(b"stub-weights")
    rep = doctor.released_weights_report()
    assert rep["parity_gate_ready"] is True
    lavila = rep["found"][doctor.RELEASED_WEIGHTS[0]["file"]]
    assert lavila["bytes"] > 0 and len(lavila["md5"]) == 32
    # a stub cannot match the name-embedded md5 prefix -> flagged False
    assert lavila["md5_matches_name"] is False
    assert "--backbone_ckpt" in rep["run"] and "--decoder_ckpt" in rep["run"]
