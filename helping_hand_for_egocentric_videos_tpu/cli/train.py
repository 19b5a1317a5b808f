"""CLI: EgoClip pretraining (the reference's run/train.py).

Example:
    python -m helping_hand_for_egocentric_videos_tpu.cli.train \
        --meta_dir data/EgoClip --data_dir /datasets/ego4d \
        --backbone_ckpt ckpts/clip_openai_timesformer_large...pth \
        --batch_size 128 --set optim.lr=3e-5
"""

from __future__ import annotations

import argparse

from ..core.config import ExperimentConfig, apply_overrides
from . import common


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", default="egoclip_pretrain")
    p.add_argument("--output_dir", default="runs")
    p.add_argument("--meta_dir", default="data/EgoClip")
    p.add_argument("--data_dir", default="./")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_frames", type=int, default=4)
    p.add_argument("--num_queries", type=int, default=12)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--eval_freq", type=int, default=2500)
    p.add_argument("--runtime_save_iter", type=int, default=2500)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--backbone", default="timesformer_large")
    p.add_argument("--backbone_ckpt", default="")
    p.add_argument(
        "--int8_backbone",
        action="store_true",
        help="int8-quantize the frozen backbone's training forward "
        "(+31%% train throughput; gradients never reach it — only the "
        "constant features shift, loss parity test-gated)",
    )
    p.add_argument("--decoder_ckpt", default="")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument(
        "--augment",
        action="store_true",
        help="enable the train-time random-aug pipeline (the reference's "
        "force_centercrop=False, transforms.py:64-69); tune via --set "
        "data.randcrop_scale=a,b data.color_jitter=b,s,h",
    )
    p.add_argument("--max_steps", type=int, default=0, help="0 = unlimited")
    p.add_argument("--set", nargs="*", default=[], help="extra a.b=c overrides")
    return p.parse_args(argv)


def build_config(args) -> ExperimentConfig:
    cfg = ExperimentConfig(name=args.name, output_dir=args.output_dir)
    cfg.data.meta_dir = args.meta_dir
    cfg.data.data_dir = args.data_dir
    cfg.data.batch_size = args.batch_size
    cfg.data.num_frames = args.num_frames
    cfg.data.num_workers = args.num_workers
    cfg.data.augment = args.augment
    cfg.model.backbone = args.backbone
    cfg.model.backbone_ckpt = args.backbone_ckpt
    cfg.model.int8_backbone = args.int8_backbone
    cfg.model.decoder_ckpt = args.decoder_ckpt
    cfg.model.num_queries = args.num_queries
    cfg.optim.lr = args.lr
    cfg.optim.wd = args.wd
    cfg.optim.epochs = args.epochs
    cfg.optim.seed = args.seed
    cfg.optim.eval_freq = args.eval_freq
    cfg.optim.runtime_save_iter = args.runtime_save_iter
    cfg.parallel.model_parallel = args.model_parallel
    return apply_overrides(cfg, args.set)


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)
    common.print_env()
    from ..train.pretrain import pretrain

    state, best = pretrain(cfg, max_steps=args.max_steps or None)
    print(f"done. best EgoMCQ Inter-video acc: {best:.3f}")


if __name__ == "__main__":
    main()
