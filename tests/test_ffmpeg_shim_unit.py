"""In-process unit tests for data/ffmpeg_shim.py.

tests/test_ffmpeg_real_decode.py drives the shim end-to-end through the
native C++ pipe (in a subprocess, invisible to line coverage); these
tests pin the CLI parser and the decode loop directly in-process.
"""

import io
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

from test_real_mp4 import FPS, H, W, _decode_idx, _write_chunk  # noqa: E402

from helping_hand_for_egocentric_videos_tpu.data import ffmpeg_shim  # noqa: E402


def _cli(ss=0.0, t=1.0, path="f.mp4", vf=f"fps={FPS:.6f},scale={W}:{H}"):
    return [
        "-nostdin", "-loglevel", "error", "-ss", str(ss), "-t", str(t),
        "-i", path, "-vf", vf, "-f", "rawvideo", "-pix_fmt", "rgb24", "-",
    ]


def test_parse_args_supported_subset():
    opt = ffmpeg_shim.parse_args(_cli(ss=0.5, t=1.25))
    assert opt == {
        "ss": 0.5,
        "t": 1.25,
        "input": "f.mp4",
        "fps": FPS,
        "scale": (W, H),
    }


@pytest.mark.parametrize(
    "argv",
    [
        ["-y", "-i", "a.mp4", "out.mp4"],  # unknown flag + non-pipe output
        _cli()[:-3] + ["-f", "mp4", "-"],  # unsupported muxer
        _cli()[:-3] + ["-f", "rawvideo", "-pix_fmt", "yuv420p", "-"],
        [a for a in _cli() if a not in ("-i", "f.mp4")],  # no input
        _cli(vf="fps=30,hflip"),  # unsupported filter
    ],
)
def test_parse_args_rejects_outside_subset(argv, capsys):
    with pytest.raises(SystemExit) as e:
        ffmpeg_shim.parse_args(argv)
    assert e.value.code == 2
    assert "ffmpeg_shim:" in capsys.readouterr().err


@pytest.fixture(scope="module")
def mp4(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("shimunit") / "0.mp4")
    _write_chunk(p, 0)
    return p


def _run_capture(argv) -> bytes:
    buf = io.BytesIO()

    class _Out:
        buffer = buf

    old = sys.stdout
    sys.stdout = _Out()
    try:
        rc = ffmpeg_shim.run(argv)
    finally:
        sys.stdout = old
    assert rc == 0
    return buf.getvalue()

def test_run_decodes_seeks_and_frames(mp4):
    raw = _run_capture(_cli(ss=0.5, t=1.0, path=mp4))
    frames = np.frombuffer(raw, np.uint8).reshape(-1, H, W, 3)
    assert len(frames) == 30
    assert [_decode_idx(f) for f in frames[:4]] == [15, 16, 17, 18]


def test_run_fps_halved_strides_sources(mp4):
    raw = _run_capture(_cli(t=1.0, path=mp4, vf=f"fps={FPS / 2:.6f},scale={W}:{H}"))
    frames = np.frombuffer(raw, np.uint8).reshape(-1, H, W, 3)
    assert [_decode_idx(f) for f in frames[:5]] == [0, 2, 4, 6, 8]


def test_run_scales_with_real_resize(mp4):
    raw = _run_capture(_cli(t=0.2, path=mp4, vf=f"fps={FPS:.6f},scale={W * 2}:{H * 2}"))
    frames = np.frombuffer(raw, np.uint8).reshape(-1, H * 2, W * 2, 3)
    assert len(frames) == 6
    small = frames[3].reshape(H, 2, W, 2, 3).mean(axis=(1, 3))
    assert _decode_idx(small) == 3


def test_run_missing_file_exits_1(capsys):
    with pytest.raises(SystemExit) as e:
        ffmpeg_shim.run(_cli(path="/nonexistent/x.mp4"))
    assert e.value.code == 1
