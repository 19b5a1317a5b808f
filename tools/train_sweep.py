"""Train-step batch-scaling sweep + one-step device profile (VERDICT r4
item 2: 'give the train step the eval treatment').

Runs bench.bench_train_step at bs in {8,16,32,64,128} (the reference
trains at global bs=128 over 8 GPUs => 16/chip; the sweep locates this
chip's knee), then captures a one-step jax device trace at the default
bs and prints utils/profiling.top_ops. Each line already carries the
analytic train FLOPs + mfu from utils/flops.py.

Usage (TPU box):  python tools/train_sweep.py [--batches 8 16 32 64 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def profile_one_step(tmpdir: str) -> list:
    """One-step device trace of the bs=16 train step at HEAD."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        init_decoder_params,
        init_lavila_params,
    )
    from helping_hand_for_egocentric_videos_tpu.models.lavila import (
        timesformer_large_config,
    )
    from helping_hand_for_egocentric_videos_tpu.train import (
        TrainConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from helping_hand_for_egocentric_videos_tpu.utils.profiling import top_ops, trace

    t, n_videos, r = 4, 16, 5
    cfg = timesformer_large_config(num_frames=t)
    dec_cfg = DecoderConfig(num_frames=t)
    tcfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    backbone = init_lavila_params(key, cfg)
    decoder = init_decoder_params(key, dec_cfg)
    optimizer = make_optimizer(tcfg)
    state = TrainState(decoder, optimizer.init(decoder), jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    tokens = np.zeros((n_videos * r, 77), np.int32)
    tokens[:, 0] = 49406
    tokens[:, 1:5] = rng.integers(1, 49000, size=(n_videos * r, 4))
    tokens[:, 5] = 49407
    batch = {
        "video": jnp.asarray(rng.normal(size=(n_videos, t, 224, 224, 3)).astype(np.float32)),
        "tokens": jnp.asarray(tokens),
        "noun_vec": jnp.asarray((rng.random((n_videos, 582)) < 0.02).astype(np.float32)),
        "verb_vec": jnp.asarray((rng.random((n_videos, 118)) < 0.05).astype(np.float32)),
        "boxes": jnp.asarray(
            (rng.random((n_videos, t, 4, 4)) * 150).astype(np.float32)
            + np.array([0, 0, 60, 60], np.float32)
        ),
        "nouns": jnp.asarray(rng.integers(0, 582, size=(n_videos, 4)).astype(np.int32)),
    }
    noun_dict = jnp.asarray(rng.normal(size=(582, 768)).astype(np.float32))
    step = jax.jit(make_train_step(dec_cfg, cfg, tcfg, optimizer))
    state, metrics = step(state, backbone, batch, noun_dict, jax.random.PRNGKey(1))
    float(metrics["total_loss"])  # compile + sync
    with trace(tmpdir):
        state, metrics = step(state, backbone, batch, noun_dict, jax.random.PRNGKey(2))
        float(metrics["total_loss"])
    return top_ops(tmpdir, k=12)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", type=int, nargs="*", default=[8, 16, 32, 64, 128])
    p.add_argument("--profile", action="store_true", default=True)
    p.add_argument("--no-profile", dest="profile", action="store_false")
    args = p.parse_args()

    import bench  # repo-root bench.py

    for bs in args.batches:
        os.environ["HH_BENCH_TRAIN_BS"] = str(bs)
        bench.bench_train_step(int8_backbone=False)
    os.environ["HH_BENCH_TRAIN_BS"] = "16"

    if args.profile:
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            ops = profile_one_step(tmp)
            print(json.dumps({"metric": "train_step_top_ops_bs16", "ops": ops}), flush=True)


if __name__ == "__main__":
    main()
