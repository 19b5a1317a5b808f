"""End-to-end LEARNING proof on synthetic fixtures (VERDICT r4 item 4).

The unit suite proves step-level properties (loss decreases over 6 steps,
box-loss overfit, AdamW update-rule parity) but nothing showed the FULL
loop — EgoClipDataset -> PrefetchLoader -> train step -> EgoMCQ eval —
actually *learns* retrieval.  This tool builds a miniature EgoClip world
where learning is possible and measurable:

- 8 clips with visually distinct content (distinct per-clip color
  patterns in one chunked-npy store);
- 8 distinct captions with distinct tagged nouns (real BPE tokenizer,
  real noun-taxonomy path);
- per-clip 100DOH-style hand/object boxes (distinct per clip);
- an 8-question inter-video EgoMCQ file whose correct choice is the
  clip matching the query caption (chance = 1/5).

It then runs the public ``pretrain`` loop (tiny towers, CPU-friendly)
for --steps steps with eval every --eval_freq, reads back the JSONL
metric logs, writes LEARNING_PROOF.json at the repo root, and exits
nonzero unless (a) final EgoMCQ inter-video accuracy beats chance by a
margin and (b) the box loss fell materially.

Reference analog: run/train.py:242-262 (eval-during-train + best
tracking); run/test_EgoMCQ.py:199-300 (the retrieval metric).

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/learning_proof.py
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RES = 28  # 2x2 patches of 14
NOUNS = ["drawer", "knife", "tomato", "plate", "kettle", "chair", "bottle", "spoon"]
VERBS = ["opens", "picks", "cuts", "washes", "lifts", "moves", "holds", "grabs"]
K = 8  # clips


def build_fixture(root: str):
    """Miniature EgoClip metadata + chunked store where retrieval is learnable."""
    import pandas as pd
    import torch

    meta = os.path.join(root, "meta")
    data = os.path.join(root, "data")
    os.makedirs(meta)
    uid = "vid_learn"
    vdir = os.path.join(data, "videos_256_chunked", uid)
    os.makedirs(vdir)

    # clip i = seconds [i, i+0.5) = frames [30i, 30i+15): a distinct color
    # pattern per clip (plus mild noise) so video embeddings can separate
    rng = np.random.default_rng(0)
    chunk = rng.integers(0, 40, size=(30 * K + 30, RES, 48, 3)).astype(np.uint8)
    for i in range(K):
        base = np.zeros((1, RES, 48, 3), np.uint8)
        base[..., 0] = 30 * i
        base[..., 1] = 255 - 30 * i
        base[..., 2] = (80 * i) % 255
        chunk[30 * i : 30 * i + 15] = base + rng.integers(
            0, 20, size=(15, RES, 48, 3)
        ).astype(np.uint8)
    np.save(os.path.join(vdir, "0.mp4.npy"), chunk)

    def caption(i):
        return f"#C C {VERBS[i]} a {NOUNS[i]}"

    rows = ["video_uid\tclip_start\tclip_end\tclip_text\ttag_noun\ttag_verb\tnarration_time"]
    for i in range(K):
        start = float(i)
        rows.append(
            f"{uid}\t{start}\t{start + 0.5}\t{caption(i)}\t[{i}]\t[{i}]\t{start}"
        )
    with open(os.path.join(meta, "egoclip.csv"), "w") as f:
        f.write("\n".join(rows))

    def choice(i):
        return {
            "video_uid": uid,
            "clip_start": float(i),
            "clip_end": float(i) + 0.5,
            "clip_text": caption(i),
            "tag_noun": f"[{i}]",
            "tag_verb": f"[{i}]",
            "narration_time": float(i),
        }

    # all inter-video (types=2 — the reference's type->name mapping has
    # 1=intra, 2=inter): query caption i among 5 video choices, correct =
    # clip i (placed at a varying slot)
    mcq = {}
    for q in range(K):
        slots = [(q + j) % K for j in range(5)]
        answer = q % 5
        slots[answer], slots[0] = slots[0], slots[answer]
        mcq[str(q)] = {
            "query": choice(q),
            "choices": {str(j): choice(slots[j]) for j in range(5)},
            "answer": answer,
            "types": 2,
        }
    with open(os.path.join(meta, "egomcq.json"), "w") as f:
        json.dump(mcq, f)

    pd.DataFrame({"group": [[n] for n in NOUNS]}).to_csv(
        os.path.join(meta, "narration_noun_taxonomy.csv"), index=False
    )
    g = torch.Generator().manual_seed(0)
    noun_dict = {"pad": torch.zeros(32)}
    for n in NOUNS:
        noun_dict[n] = torch.randn(32, generator=g)
    torch.save(noun_dict, os.path.join(meta, "noun_dict_lavila_embeds.pth"))
    torch.save({}, os.path.join(meta, "lavila_rephrased.pth"))

    # distinct per-clip boxes (raw pixels on a 32x48 "original")
    hdir = os.path.join(data, "hand_object_clip_per_video_4f_lavila_narrator_640", uid)
    os.makedirs(hdir)
    info = {}
    for i in range(K):
        x = 2 + 2 * i
        per_clip = {
            fi: {
                "hand_dets": np.array([[x, 4, x + 8, 14, 0.9]], np.float32),
                "obj_dets": np.array([[x + 1, 10, x + 12, 26, 0.8]], np.float32),
            }
            for fi in range(4)
        }
        per_clip["info"] = {"height": 32, "width": 48}
        info[round(float(i), 3)] = per_clip
    with open(os.path.join(hdir, "0.handobj.pkl"), "wb") as f:
        pickle.dump(info, f)
    return meta, data


def tiny_models(t=4):
    import jax

    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        init_decoder_params,
        init_lavila_params,
    )
    from helping_hand_for_egocentric_videos_tpu.models.clip_text import TextConfig
    from helping_hand_for_egocentric_videos_tpu.models.lavila import LavilaConfig
    from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import (
        SpaceTimeConfig,
    )

    lavila_cfg = LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=RES, patch_size=14, width=32, depth=2, heads=4, num_frames=t
        ),
        text=TextConfig(width=32, heads=4, layers=2, embed_dim=16),
        embed_dim=16,
    )
    dec_cfg = DecoderConfig(
        d_model=32,
        nhead=4,
        num_layers=2,
        dim_feedforward=64,
        num_queries=13,
        num_classes=8,
        feature_dim=32,
        text_width=32,
        embed_dim=16,
        num_frames=t,
        patches_per_frame=lavila_cfg.visual.patches_per_frame,
    )
    backbone = init_lavila_params(jax.random.PRNGKey(0), lavila_cfg)
    decoder = init_decoder_params(jax.random.PRNGKey(1), dec_cfg)
    return lavila_cfg, backbone, dec_cfg, decoder


def main(steps: int, eval_freq: int, lr: float, out_path: str | None) -> dict:
    from helping_hand_for_egocentric_videos_tpu.core.config import ExperimentConfig
    from helping_hand_for_egocentric_videos_tpu.train.pretrain import pretrain

    with tempfile.TemporaryDirectory() as tmp:
        meta, data = build_fixture(tmp)
        cfg = ExperimentConfig(name="learnproof", output_dir=os.path.join(tmp, "runs"))
        cfg.data.meta_dir = meta
        cfg.data.data_dir = data
        cfg.data.batch_size = 4
        cfg.data.num_frames = 4
        cfg.data.input_res = RES
        cfg.data.num_workers = 2
        cfg.model.num_queries = 12
        cfg.optim.lr = lr
        cfg.optim.epochs = 10_000  # max_steps stops the run
        cfg.optim.eval_freq = eval_freq
        cfg.optim.runtime_save_iter = 10**9
        cfg.optim.log_flush_iter = eval_freq
        cfg.parallel.backbone_dtype = "float32"
        cfg.parallel.num_devices = 1

        state, best = pretrain(cfg, max_steps=steps, eval_limit=K, models=tiny_models())

        exp = os.path.join(tmp, "runs", "learnproof")
        train_lines = [json.loads(l) for l in open(os.path.join(exp, "train_metrics.jsonl"))]
        val_lines = [json.loads(l) for l in open(os.path.join(exp, "val_metrics.jsonl"))]

    loss_curve = [
        (l["step"], round(l["local/total_loss"], 4))
        for l in train_lines
        if "local/total_loss" in l
    ]
    box_curve = [
        (l["step"], round(l["local/box_loss"], 4))
        for l in train_lines
        if "local/box_loss" in l
    ]
    acc_curve = [
        (l["step"], round(l["egomcq/Inter-video"], 4))
        for l in val_lines
        if "egomcq/Inter-video" in l
    ]

    def head(curve, k=3):
        return curve[:k]

    result = {
        "what": "full pretrain loop (dataset->loader->step->EgoMCQ eval) on a "
                "learnable miniature fixture; tiny towers, CPU",
        "steps": steps,
        "chance_acc_pct": 100.0 / 5,  # 5 choices; accuracies below are %
        "final_inter_video_acc": acc_curve[-1][1] if acc_curve else None,
        "best_inter_video_acc": float(best),
        "first_total_loss": loss_curve[0][1] if loss_curve else None,
        "final_total_loss": loss_curve[-1][1] if loss_curve else None,
        "first_box_loss": box_curve[0][1] if box_curve else None,
        "final_box_loss": box_curve[-1][1] if box_curve else None,
        "acc_curve": acc_curve,
        "loss_curve_head": head(loss_curve),
        "loss_curve_tail": loss_curve[-3:],
        "box_curve_head": head(box_curve),
        "box_curve_tail": box_curve[-3:],
    }
    ok = (
        result["best_inter_video_acc"] is not None
        and result["best_inter_video_acc"] >= 50.0  # chance is 20%
        and result["first_box_loss"] is not None
        and result["final_box_loss"] < 0.7 * result["first_box_loss"]
    )
    result["pass"] = bool(ok)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--eval_freq", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--out", default=os.path.join(REPO, "LEARNING_PROOF.json"))
    a = p.parse_args()
    res = main(a.steps, a.eval_freq, a.lr, a.out)
    sys.exit(0 if res["pass"] else 1)
