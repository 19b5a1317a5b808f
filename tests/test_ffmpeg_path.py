"""Execute the real mp4 decode path with a fake ``ffmpeg`` on PATH.

The production EgoClip reader decodes 600 s chunked mp4s by piping rgb24
rawvideo out of an ffmpeg CLI process (native/hh_dataio.cpp
hh_decode_clip_ffmpeg; reference counterpart: decord in
read_frames_cv2_egoclip_decord, base/base_dataset.py:274-323). No ffmpeg
binary exists on this box, so every other test uses ``.mp4.npy``
stand-ins and this code would otherwise first execute in production
(VERDICT r2 item 3).

The shim here is an executable ``ffmpeg`` script that:
  1. validates the full constructed command line (seek offset ``-ss``,
     duration ``-t``, ``fps=..,scale=w:h`` filter, rawvideo/rgb24 output
     to stdout) and logs it for assertions;
  2. models a 30 fps source whose frame k has constant pixel value
     ``(base + k) % 256`` (per-file ``base`` from a JSON sidecar), so the
     decoded pixels prove which source frames the seek math selected.

Covered: has_ffmpeg gating, decode_clip_ffmpeg framing, read_frames_at
span selection, read_clip_chunked's real-mp4 branch incl. cross-chunk
stitching and the missing-next-chunk tail-resample fallback.
"""

import json
import os
import stat
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from helping_hand_for_egocentric_videos_tpu.data import native, video

SHIM = r'''#!/usr/bin/env python3
import json, os, re, sys

args = sys.argv[1:]


def val(flag):
    return args[args.index(flag) + 1]


assert "-nostdin" in args, args
assert args[-1] == "-", args  # rawvideo to stdout
assert val("-f") == "rawvideo", args
assert val("-pix_fmt") == "rgb24", args
ss, t, path = float(val("-ss")), float(val("-t")), val("-i")
m = re.fullmatch(r"fps=([\d.]+),scale=(\d+):(\d+)", val("-vf"))
assert m, args
fps, w, h = float(m.group(1)), int(m.group(2)), int(m.group(3))

with open(os.environ["FAKE_FFMPEG_LOG"], "a") as f:
    f.write(json.dumps({"ss": ss, "t": t, "path": path, "fps": fps,
                        "w": w, "h": h}) + "\n")

with open(path + ".meta.json") as f:
    meta = json.load(f)
start_f = int(round(ss * fps))
n = int(round(t * fps))
out = sys.stdout.buffer
for k in range(n):
    idx = start_f + k
    if idx >= meta["frames"]:
        break
    out.write(bytes([(meta["base"] + idx) % 256]) * (w * h * 3))
'''


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    try:
        native.get_lib()
    except native.NativeUnavailable:
        pytest.skip("native stage unavailable (no toolchain)")
    shim_dir = tmp_path / "bin"
    shim_dir.mkdir()
    shim = shim_dir / "ffmpeg"
    shim.write_text(SHIM)
    shim.chmod(shim.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    log = tmp_path / "ffmpeg_calls.jsonl"
    log.write_text("")
    monkeypatch.setenv("PATH", f"{shim_dir}:{os.environ['PATH']}")
    monkeypatch.setenv("FAKE_FFMPEG_LOG", str(log))

    def make_chunk(name, frames, base):
        p = tmp_path / name
        p.write_bytes(b"\x00\x00\x00 ftypisom")  # mp4-ish magic; shim never reads it
        (tmp_path / (name + ".meta.json")).write_text(
            json.dumps({"frames": frames, "base": base})
        )
        return str(p)

    return tmp_path, log, make_chunk


def _calls(log):
    return [json.loads(line) for line in log.read_text().splitlines()]


def _frame_values(frames):
    # every emitted frame is constant-valued; assert that and project
    vals = []
    for f in frames:
        u = np.unique(f)
        assert len(u) == 1, "shim frames are constant-valued"
        vals.append(int(u[0]))
    return vals


def test_has_ffmpeg_gating(fake_ffmpeg, monkeypatch):
    assert native.has_ffmpeg()
    assert "native-ffmpeg" in video.available_backends()
    monkeypatch.setenv("PATH", "/nonexistent")
    assert not native.has_ffmpeg()


def test_decode_clip_ffmpeg_framing(fake_ffmpeg):
    tmp, log, make_chunk = fake_ffmpeg
    path = make_chunk("v.mp4", frames=18000, base=7)
    out = native.decode_clip_ffmpeg(path, 2.0, 0.5, 30.0, 64, 32, 100)
    assert out.shape == (15, 32, 64, 3)  # int(round(0.5 * 30)) frames
    assert _frame_values(out) == [(7 + 60 + k) % 256 for k in range(15)]
    (call,) = _calls(log)
    assert call == {"ss": 2.0, "t": 0.5, "path": path, "fps": 30.0, "w": 64, "h": 32}


def test_read_frames_at_span_selection(fake_ffmpeg):
    tmp, log, make_chunk = fake_ffmpeg
    path = make_chunk("v.mp4", frames=18000, base=0)
    ids = [100, 107, 115, 122]
    frames = video.read_frames_at(path, ids, fps=30.0)
    h, w = video.DECODE_RES
    assert frames.shape == (4, h, w, 3)
    assert _frame_values(frames) == [i % 256 for i in ids]
    (call,) = _calls(log)
    np.testing.assert_allclose(call["ss"], 100 / 30.0, atol=1e-4)
    # span = max-min+1 frames, +0.5 s slack (data/video.py read_frames_at)
    np.testing.assert_allclose(call["t"], 23 / 30.0 + 0.5, atol=1e-4)
    assert (call["w"], call["h"]) == (w, h)


def test_read_clip_chunked_mp4_single_chunk(fake_ffmpeg):
    tmp, log, make_chunk = fake_ffmpeg
    # clip at [1210.0, 1212.0) lives in the 1200 s chunk at offset 10 s
    path = make_chunk("1200.mp4", frames=18000, base=3)
    frames, secs = video.read_clip_chunked(
        path, 1210.0, 1212.0, chunk_len=600, fps=30.0, clip_length=4
    )
    assert frames.shape == (4, *video.DECODE_RES, 3)
    # get_frame_ids over [300, 360): segment midpoints 307, 322, 337, 352
    ids = [int(round(s * 30.0)) for s in secs]
    assert min(ids) >= 300 and max(ids) < 360
    assert _frame_values(frames) == [(3 + i) % 256 for i in ids]


def test_read_clip_chunked_mp4_cross_chunk_stitch(fake_ffmpeg):
    tmp, log, make_chunk = fake_ffmpeg
    # clip starts 599.5 s into the 0 s chunk and ends 0.7 s into the next:
    # sampled ids straddle the 18000-frame boundary
    p0 = make_chunk("0.mp4", frames=18000, base=10)
    p1 = make_chunk("600.mp4", frames=18000, base=200)
    frames, secs = video.read_clip_chunked(
        p0, 599.5, 600.7, next_path=p1, chunk_len=600, fps=30.0, clip_length=4
    )
    ids = [int(round(s * 30.0)) for s in secs]
    assert max(ids) >= 18000 > min(ids), ids  # really straddles
    want = [
        (10 + i) % 256 if i < 18000 else (200 + (i - 18000)) % 256 for i in ids
    ]
    assert _frame_values(frames) == want
    calls = _calls(log)
    assert len(calls) == 2
    assert calls[0]["path"] == p0 and calls[1]["path"] == p1


def test_read_clip_chunked_mp4_missing_next_chunk_fallback(fake_ffmpeg):
    tmp, log, make_chunk = fake_ffmpeg
    # same straddle, but the next chunk does not exist: the reader must
    # resample the tail of the current chunk (reference error path,
    # base/base_dataset.py:316-321)
    p0 = make_chunk("0.mp4", frames=18000, base=50)
    frames, secs = video.read_clip_chunked(
        p0,
        599.5,
        600.7,
        next_path=str(tmp / "does_not_exist.mp4"),
        chunk_len=600,
        fps=30.0,
        clip_length=4,
    )
    ids = [int(round(s * 30.0)) for s in secs]
    assert max(ids) < 18000, ids  # resampled inside the chunk
    assert min(ids) >= 17985  # tail window [offset, vlen)
    assert _frame_values(frames) == [(50 + i) % 256 for i in ids]
    assert all(c["path"] == p0 for c in _calls(log))


def test_extract_clips_ffmpeg_branch_skip_overwrite_and_failure(fake_ffmpeg, capsys):
    """cli.extract_clips over the native ffmpeg pipe: full-chunk decode at
    the requested fps/scale, skip-existing vs --overwrite, and a corrupt
    source (0 decoded frames) must NOT leave an empty .npy store."""
    from helping_hand_for_egocentric_videos_tpu.cli import extract_clips

    tmp_path, log, make_chunk = fake_ffmpeg
    (tmp_path / "vids" / "v1").mkdir(parents=True)
    make_chunk("vids/v1/0.mp4", frames=10, base=50)
    # corrupt source: no .meta.json sidecar -> the shim dies, pipe EOFs
    (tmp_path / "vids" / "v1" / "bad.mp4").write_bytes(b"\x00\x00\x00 ftypisom")

    extract_clips.main(
        ["--src", str(tmp_path / "vids"), "--fps", "30", "--height", "4", "--width", "6"]
    )
    out = capsys.readouterr().out
    assert "extracted 1/2 videos" in out and "FAILED" in out
    store = tmp_path / "vids" / "v1" / "0.mp4.npy"
    arr = np.load(store)
    assert arr.shape == (10, 4, 6, 3)
    assert _frame_values(arr) == list(range(50, 60))
    assert not (tmp_path / "vids" / "v1" / "bad.mp4.npy").exists()
    (call,) = [c for c in _calls(log) if c["path"].endswith("0.mp4")]
    assert call["ss"] == 0.0 and call["fps"] == 30.0 and (call["w"], call["h"]) == (6, 4)

    # existing store is skipped without --overwrite...
    n_calls = len(_calls(log))
    extract_clips.main(
        ["--src", str(tmp_path / "vids"), "--fps", "30", "--height", "4", "--width", "6"]
    )
    good_calls = [c for c in _calls(log) if c["path"].endswith("0.mp4")]
    assert len(good_calls) == 1  # not re-decoded

    # ...and re-extracted with it (stale store removed before decode)
    np.save(store, np.zeros((1, 4, 6, 3), np.uint8))  # poison the store
    extract_clips.main(
        ["--src", str(tmp_path / "vids"), "--fps", "30", "--height", "4",
         "--width", "6", "--overwrite"]
    )
    good_calls = [c for c in _calls(log) if c["path"].endswith("0.mp4")]
    assert len(good_calls) == 2
    assert _frame_values(np.load(store)) == list(range(50, 60))
