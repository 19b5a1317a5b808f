"""Drive the native ffmpeg-pipe decoder against REAL encoded mp4s.

tests/test_ffmpeg_path.py validates the pipe's CLI surface with a fake
constant-frame ``ffmpeg``; this file closes the remaining gap by putting
a *real-decode* ``ffmpeg`` on PATH (data/ffmpeg_shim.py — cv2's bundled
FFmpeg does the codec work, only the CLI front-end is emulated) and
running the production C++ popen/rawvideo path (native/hh_dataio.cpp:
167-187, the decord replacement for base/base_dataset.py:274-323) end to
end on genuine mp4 files: accurate -ss seek, rawvideo framing at several
resolutions, fps resampling, and RGB channel order.

On a host with genuine ffmpeg, tests/test_real_mp4.py::
test_ffmpeg_pipe_decodes_real_mp4 runs the same scenario un-shimmed
(docs/DATA.md deploy checklist).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

from test_real_mp4 import (  # noqa: E402
    FPS,
    H,
    W,
    ZONE_RGB,
    _decode_idx,
    _write_chunk,
)

from helping_hand_for_egocentric_videos_tpu.data import ffmpeg_shim as _shim_mod  # noqa: E402

TOOL = _shim_mod.__file__


@pytest.fixture()
def real_shim(tmp_path, monkeypatch):
    """Install data/ffmpeg_shim.py as ``ffmpeg`` at the front of PATH."""
    out = subprocess.run(
        [sys.executable, TOOL, "--install", str(tmp_path / "bin")],
        capture_output=True,
        text=True,
        check=True,
    )
    assert out.stdout.strip().endswith("ffmpeg")
    monkeypatch.setenv("PATH", f"{tmp_path / 'bin'}:{os.environ['PATH']}")


@pytest.fixture(scope="module")
def mp4(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("shimmp4") / "0.mp4")
    _write_chunk(p, 0)  # genuine mp4, global frames 0..89 stripe-encoded
    return p


def test_has_ffmpeg_sees_shim(real_shim):
    from helping_hand_for_egocentric_videos_tpu.data import native

    assert native.has_ffmpeg()


def test_pipe_real_decode_seek_order_rgb(real_shim, mp4):
    """The docstring scenario of test_ffmpeg_pipe_decodes_real_mp4, now
    actually executed: 1 s starting at t=0.5 -> frames 15..44, RGB."""
    from helping_hand_for_egocentric_videos_tpu.data import native

    frames = native.decode_clip_ffmpeg(mp4, 0.5, 1.0, FPS, W, H, 40)
    assert len(frames) >= 25
    assert abs(_decode_idx(frames[0]) - 15) <= 2
    ids = [_decode_idx(f) for f in frames[:10]]
    assert ids == sorted(ids) and len(set(ids)) >= 9  # consecutive
    zone = frames[0][36:, :, :].reshape(-1, 3).mean(axis=0)
    assert abs(zone[0] - ZONE_RGB[0]) < 40  # RGB, not BGR
    assert abs(zone[2] - ZONE_RGB[2]) < 40


def test_pipe_framing_at_scaled_resolution(real_shim, mp4):
    """Non-native W/H changes frame_bytes — catches any rawvideo framing
    slip between the shim's writes and the C reader's fixed-size freads."""
    from helping_hand_for_egocentric_videos_tpu.data import native

    w2, h2 = W * 2, H * 2
    frames = native.decode_clip_ffmpeg(mp4, 0.0, 0.5, FPS, w2, h2, 20)
    assert frames.shape == (15, h2, w2, 3)
    # stripes survive 2x upscale: decode indices off the scaled frames
    up = [
        _decode_idx(f.reshape(h2 // 2, 2, w2 // 2, 2, 3).mean(axis=(1, 3)))
        for f in frames[:5]
    ]
    assert up == [0, 1, 2, 3, 4]


def test_pipe_fps_resample(real_shim, mp4):
    """fps=FPS/2 halves the tick rate -> stride-2 source frames."""
    from helping_hand_for_egocentric_videos_tpu.data import native

    frames = native.decode_clip_ffmpeg(mp4, 0.0, 1.0, FPS / 2, W, H, 20)
    assert len(frames) >= 13
    ids = [_decode_idx(f) for f in frames[:10]]
    assert ids == list(range(0, 20, 2))


def test_pipe_seek_drops_frames_before_ss(real_shim, mp4):
    """-ss is an accurate seek: the first kept frame has pts >= S
    (genuine-ffmpeg semantics). ss=0.51 @30fps must start at frame 16 —
    round(0.51*30)=15 would keep a frame from before S."""
    from helping_hand_for_egocentric_videos_tpu.data import native

    frames = native.decode_clip_ffmpeg(mp4, 0.51, 0.5, FPS, W, H, 10)
    assert _decode_idx(frames[0]) == 16


def test_pipe_max_frames_truncation(real_shim, mp4):
    """Reader pcloses after max_frames; the shim must exit 0 on the
    broken pipe and the C side must return exactly max_frames."""
    from helping_hand_for_egocentric_videos_tpu.data import native

    frames = native.decode_clip_ffmpeg(mp4, 0.0, 3.0, FPS, W, H, 7)
    assert frames.shape[0] == 7
    assert [_decode_idx(f) for f in frames] == [0, 1, 2, 3, 4, 5, 6]


def test_shim_rejects_unknown_cli(real_shim, tmp_path):
    """The emulator is strict: a command line outside the implemented
    subset errors instead of silently mis-decoding."""
    r = subprocess.run(
        ["ffmpeg", "-y", "-i", str(tmp_path / "x.mp4"), "out.mp4"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 2
    assert "unsupported" in r.stderr
