"""Drive the native popen pipe through the GENUINE-libav CLI decoder.

tests/test_ffmpeg_real_decode.py proves real-codec decode through the
Python shim (cv2's bundled FFmpeg behind an emulated CLI). This module
closes the remaining layer: ``native/hh_ffmpeg.c`` is a C binary
speaking the real libavformat/libavcodec/libswscale API — demux, decode,
scale, rawvideo — with zero Python anywhere in the decode path. Built
on demand (data/native.py::build_hh_ffmpeg), installed as ``ffmpeg`` on
PATH, and exercised through the production C++ popen path
(native/hh_dataio.cpp:167-187, the decord replacement for the
reference's base/base_dataset.py:274-323): accurate -ss seek, fps
resampling, rawvideo framing at a scaled resolution, RGB order, and
max_frames EPIPE truncation.

Skipped when the libav dev headers or a C toolchain are absent.
"""

import os
import subprocess

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

from helping_hand_for_egocentric_videos_tpu.data import native  # noqa: E402


@pytest.fixture(scope="module")
def hh_ffmpeg_tool():
    try:
        return native.build_hh_ffmpeg()
    except native.NativeUnavailable as e:
        pytest.skip(f"hh_ffmpeg not buildable here: {e}")


@pytest.fixture()
def on_path(hh_ffmpeg_tool, tmp_path, monkeypatch):
    """Install hh_ffmpeg as ``ffmpeg`` at the front of PATH."""
    wrapper = native.install_hh_ffmpeg(str(tmp_path / "bin"))
    assert wrapper.endswith("ffmpeg") and os.access(wrapper, os.X_OK)
    monkeypatch.setenv("PATH", f"{tmp_path / 'bin'}:{os.environ['PATH']}")


@pytest.fixture(scope="module")
def mp4(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("hhffmp4") / "0.mp4")
    _write_chunk(p, 0)  # genuine mp4, frames 0..89 stripe-encoded
    return p


def test_has_ffmpeg_sees_native_tool(on_path):
    assert native.has_ffmpeg()


def test_pipe_native_decode_seek_order_rgb(on_path, mp4):
    """1 s starting at t=0.5 -> frames 15..44, consecutive, RGB order."""
    frames = native.decode_clip_ffmpeg(mp4, 0.5, 1.0, FPS, W, H, 40)
    assert len(frames) >= 25
    assert abs(_decode_idx(frames[0]) - 15) <= 2
    ids = [_decode_idx(f) for f in frames[:10]]
    assert ids == sorted(ids) and len(set(ids)) >= 9  # consecutive
    zone = frames[0][36:, :, :].reshape(-1, 3).mean(axis=0)
    assert abs(zone[0] - ZONE_RGB[0]) < 40  # RGB, not BGR
    assert abs(zone[2] - ZONE_RGB[2]) < 40


def test_pipe_native_framing_at_scaled_resolution(on_path, mp4):
    w2, h2 = W * 2, H * 2
    frames = native.decode_clip_ffmpeg(mp4, 0.0, 0.5, FPS, w2, h2, 20)
    assert frames.shape == (15, h2, w2, 3)
    up = [
        _decode_idx(f.reshape(h2 // 2, 2, w2 // 2, 2, 3).mean(axis=(1, 3)))
        for f in frames[:5]
    ]
    assert up == [0, 1, 2, 3, 4]


def test_pipe_native_fps_resample(on_path, mp4):
    frames = native.decode_clip_ffmpeg(mp4, 0.0, 1.0, FPS / 2, W, H, 20)
    assert len(frames) >= 13
    ids = [_decode_idx(f) for f in frames[:10]]
    assert ids == list(range(0, 20, 2))


def test_pipe_native_accurate_seek(on_path, mp4):
    """ss=0.51 @30fps keeps only frames with pts >= S: first is 16."""
    frames = native.decode_clip_ffmpeg(mp4, 0.51, 0.5, FPS, W, H, 10)
    assert _decode_idx(frames[0]) == 16


def test_pipe_native_max_frames_truncation(on_path, mp4):
    """pclose after max_frames: the binary must exit cleanly on EPIPE
    and the C reader must return exactly max_frames frames."""
    frames = native.decode_clip_ffmpeg(mp4, 0.0, 3.0, FPS, W, H, 7)
    assert frames.shape[0] == 7
    assert [_decode_idx(f) for f in frames] == [0, 1, 2, 3, 4, 5, 6]


def test_native_tool_rejects_unknown_cli(hh_ffmpeg_tool, tmp_path):
    """Strict subset: anything it does not implement is exit 2, never a
    silent mis-decode."""
    r = subprocess.run(
        [hh_ffmpeg_tool, "-y", "-i", str(tmp_path / "x.mp4"), "out.mp4"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 2
    assert "unsupported" in r.stderr


def test_native_tool_agrees_with_shim(hh_ffmpeg_tool, mp4):
    """Same CLI, same mp4: the genuine-libav binary and the cv2-backed
    shim must select the SAME source frames (pixel values may differ by
    codec/scaler rounding; the stripe-coded indices must not)."""
    import sys

    from helping_hand_for_egocentric_videos_tpu.data import ffmpeg_shim

    args = [
        "-nostdin", "-loglevel", "error", "-ss", "1.0", "-t", "0.5",
        "-i", mp4, "-vf", f"fps={FPS / 2},scale={W}:{H}",
        "-f", "rawvideo", "-pix_fmt", "rgb24", "-",
    ]
    a = subprocess.run([hh_ffmpeg_tool] + args, capture_output=True, check=True)
    b = subprocess.run(
        [sys.executable, ffmpeg_shim.__file__] + args, capture_output=True, check=True
    )
    fb = H * W * 3
    na, nb_ = len(a.stdout) // fb, len(b.stdout) // fb
    assert na == nb_ > 0
    fa = np.frombuffer(a.stdout, np.uint8).reshape(na, H, W, 3)
    fsh = np.frombuffer(b.stdout, np.uint8).reshape(nb_, H, W, 3)
    assert [_decode_idx(x) for x in fa] == [_decode_idx(x) for x in fsh]
