"""Host loader/collate stage breakdown (VERDICT r4 item 3).

BENCH_NOTES records raw npy decode at ~1,134 16f-clips/s/core but the
assembled host stage at only ~45-61 clips/s — a ~20x collapse nobody had
decomposed.  This tool times each stage of the exact bench_e2e workload
(chunked uint8 npy store, 8-clip batches, 16 frames @ 256x342) in
isolation on one process:

  slice       raw mmap fancy-index npy[ids] (the 1,134 number's stage)
  item        full read_clip_chunked per item (header parse, id math)
  items+collate  sequential dataset[i] x8 + np.stack
  loader_t1   PrefetchLoader num_threads=1 depth=2
  loader_t4   PrefetchLoader num_threads=4 depth=2 (bench_e2e config)

Prints one JSON line per stage (clips/s) and a final summary line.
Run on an otherwise-idle host: every number here is per-core and
contention-sensitive.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from helping_hand_for_egocentric_videos_tpu.data.loader import (  # noqa: E402
    PrefetchLoader,
    ShardedSampler,
    collate,
)
from helping_hand_for_egocentric_videos_tpu.data.video import (  # noqa: E402
    read_clip_chunked,
)

B, FRAMES, N_CHUNKS, CHUNK_FRAMES, HW = 8, 16, 6, 96, (256, 342)


def main(n_batches: int = 24):
    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, size=(CHUNK_FRAMES, *HW, 3)).astype(np.uint8)
        paths = []
        for c in range(N_CHUNKS):
            np.save(os.path.join(tmp, f"{c}.mp4.npy"), frames)
            paths.append(os.path.join(tmp, f"{c}.mp4"))

        n_items = B * n_batches

        # warm the page cache so every stage reads memory, not disk
        for c in range(N_CHUNKS):
            np.load(os.path.join(tmp, f"{c}.mp4.npy")).sum()

        # -- stage: raw mmap slice (reopen per item, like _maybe_npy does)
        ids = np.linspace(0, CHUNK_FRAMES - 1, FRAMES).astype(int)
        t0 = time.perf_counter()
        for i in range(n_items):
            m = np.load(os.path.join(tmp, f"{i % N_CHUNKS}.mp4.npy"), mmap_mode="r")
            _ = m[ids]
        out["slice"] = n_items / (time.perf_counter() - t0)

        # -- stage: full per-item reader
        def item(i):
            start = (i * 0.37) % 2.0
            clip, _ = read_clip_chunked(
                paths[i % N_CHUNKS], start, start + 1.0, clip_length=FRAMES
            )
            return {"video": clip}

        t0 = time.perf_counter()
        for i in range(n_items):
            item(i)
        out["item"] = n_items / (time.perf_counter() - t0)

        # -- stage: sequential batch assembly (items + collate)
        t0 = time.perf_counter()
        for bi in range(n_batches):
            collate([item(bi * B + j) for j in range(B)])
        out["items+collate"] = n_items / (time.perf_counter() - t0)

        class DS:
            def __len__(self):
                return n_items

            def __getitem__(self, i):
                return item(i)

        # -- stage: PrefetchLoader at 1 and 4 threads
        for nt in (1, 4):
            sampler = ShardedSampler(n_items, B, shuffle=False, drop_last=True)
            loader = PrefetchLoader(DS(), sampler, num_threads=nt, depth=2)
            t0 = time.perf_counter()
            n_clips = sum(batch["video"].shape[0] for batch in loader)
            out[f"loader_t{nt}"] = n_clips / (time.perf_counter() - t0)

    for k, v in out.items():
        print(json.dumps({"stage": k, "clips_per_sec": round(v, 1)}), flush=True)
    print(json.dumps({"metric": "host_stage_breakdown", **{k: round(v, 1) for k, v in out.items()}}), flush=True)
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
