"""Real encoded-video decode tests (cv2/ffmpeg backend).

Every other data test uses ``.npy`` clip stand-ins; here we encode
GENUINE mp4 files (cv2's ffmpeg build) and drive the production decode
branch end to end: frame-count probing, index seeks, BGR->RGB
conversion, chunk-boundary stitching (base/base_dataset.py:274-323
semantics), the seconds-window reader, and the offline extraction CLI —
then assert the ``.npy`` fast path reproduces the mp4 path bit-for-bit,
which is what makes the stand-ins elsewhere representative.

Frame indices are encoded losslessly through the lossy codec: eight
8-pixel-wide binary stripes (one DCT block each, uniform 0/255) carry
the index bits; a solid BGR-asymmetric zone below them catches channel
swaps.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from helping_hand_for_egocentric_videos_tpu.data.video import (  # noqa: E402
    _video_num_frames,
    available_backends,
    read_clip_chunked,
    read_clip_seconds,
    read_frames_at,
)
from helping_hand_for_egocentric_videos_tpu.data import get_frame_ids  # noqa: E402

FPS = 30.0
W, H = 64, 48
CHUNK_SEC = 3  # 90-frame chunk files, the 600s Ego4D layout scaled down
CHUNK_FRAMES = int(CHUNK_SEC * FPS)
# solid zone (rows 32+) colour, in RGB: asymmetric across channels
ZONE_RGB = (220, 64, 30)


def _frame(idx: int) -> np.ndarray:
    """BGR frame encoding ``idx`` in binary stripes (rows 0-31)."""
    img = np.zeros((H, W, 3), np.uint8)
    for bit in range(8):
        img[:32, bit * 8 : (bit + 1) * 8, :] = 255 if (idx >> bit) & 1 else 0
    img[32:, :, 0] = ZONE_RGB[2]  # writer takes BGR
    img[32:, :, 1] = ZONE_RGB[1]
    img[32:, :, 2] = ZONE_RGB[0]
    return img


def _decode_idx(frame_rgb: np.ndarray) -> int:
    idx = 0
    for bit in range(8):
        if frame_rgb[:32, bit * 8 : (bit + 1) * 8, :].mean() > 127:
            idx |= 1 << bit
    return idx


def _write_chunk(path: str, start_idx: int, n: int = CHUNK_FRAMES):
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H))
    assert wr.isOpened(), "cv2 build lacks mp4 encoding"
    for i in range(n):
        wr.write(_frame(start_idx + i))
    wr.release()


@pytest.fixture(scope="module")
def chunks(tmp_path_factory):
    """Two consecutive chunk files: 0.mp4 (global frames 0-89) and
    3.mp4 (global frames 90-179), named by their start second like the
    chunked Ego4D release."""
    root = tmp_path_factory.mktemp("realmp4")
    p0 = str(root / "0.mp4")
    p1 = str(root / "3.mp4")
    _write_chunk(p0, 0)
    _write_chunk(p1, CHUNK_FRAMES)
    return p0, p1


def test_backend_probe(chunks):
    p0, _ = chunks
    assert "cv2" in available_backends()
    assert _video_num_frames(p0) == CHUNK_FRAMES


def test_read_frames_at_exact_indices_and_rgb(chunks):
    p0, _ = chunks
    ids = [0, 7, 43, 89]
    frames = read_frames_at(p0, ids, FPS)
    assert frames.shape == (4, H, W, 3) and frames.dtype == np.uint8
    assert [_decode_idx(f) for f in frames] == ids
    # solid zone must come back in RGB order (catches a missing
    # BGR->RGB conversion: R and B would swap)
    zone = frames[0][32:, :, :].reshape(-1, 3).mean(axis=0)
    assert abs(zone[0] - ZONE_RGB[0]) < 25 and abs(zone[2] - ZONE_RGB[2]) < 25
    assert zone[0] > zone[1] > zone[2]


def test_chunked_within_one_chunk(chunks):
    _, p1 = chunks
    # [4.0s, 5.0s) lives in chunk file 3.mp4 at local frames 30..60
    frames, secs = read_clip_chunked(
        p1, 4.0, 5.0, chunk_len=CHUNK_SEC, fps=FPS, clip_length=4
    )
    want_local = get_frame_ids(30, 60, num_segments=4, jitter=False)
    got = [_decode_idx(f) for f in frames]
    assert got == [CHUNK_FRAMES + i for i in want_local]
    assert secs == [i / FPS for i in want_local]


def test_chunked_cross_chunk_stitch(chunks):
    p0, p1 = chunks
    # [2.0s, 4.0s) straddles the boundary: local frames 60..120 of chunk
    # 0, the tail read from next_path with re-offset indices
    frames, _ = read_clip_chunked(
        p0, 2.0, 4.0, next_path=p1, chunk_len=CHUNK_SEC, fps=FPS, clip_length=8
    )
    want = get_frame_ids(60, 120, num_segments=8, jitter=False)
    assert any(i >= CHUNK_FRAMES for i in want)  # really crosses
    assert [_decode_idx(f) for f in frames] == want  # global == local here


def test_chunked_missing_next_resamples_tail(chunks):
    p0, _ = chunks
    # same window but the next chunk doesn't exist: the reference error
    # path resamples inside [offset, vlen) (base_dataset.py:316-321)
    frames, _ = read_clip_chunked(
        p0, 2.0, 4.0, chunk_len=CHUNK_SEC, fps=FPS, clip_length=8
    )
    want = get_frame_ids(60, CHUNK_FRAMES, num_segments=8, jitter=False)
    assert [_decode_idx(f) for f in frames] == want


def test_read_clip_seconds_window(chunks):
    p0, _ = chunks
    frames, ids = read_clip_seconds(
        p0, 4, start_sec=1.0, end_sec=2.0, fps=FPS
    )
    assert all(30 <= i < 60 for i in ids)
    assert [_decode_idx(f) for f in frames] == list(ids)


def test_extract_clips_cli_and_npy_equivalence(chunks, tmp_path):
    """Offline extraction over real mp4s; the resulting .npy store must
    reproduce the mp4 decode path exactly (what makes the .npy stand-ins
    used by every other data test representative)."""
    from helping_hand_for_egocentric_videos_tpu.cli.extract_clips import main

    p0, p1 = chunks
    src = tmp_path / "videos" / "vid_a"
    src.mkdir(parents=True)
    for p in (p0, p1):
        os.link(p, src / os.path.basename(p))
    main(
        [
            "--src", str(tmp_path / "videos"),
            "--fps", str(FPS),
            "--height", str(H),
            "--width", str(W),
        ]
    )
    mp4_frames, _ = read_clip_chunked(
        p0, 2.0, 4.0, next_path=p1, chunk_len=CHUNK_SEC, fps=FPS, clip_length=8
    )
    e0 = str(src / "0.mp4")
    assert os.path.exists(e0 + ".npy")
    npy_frames, _ = read_clip_chunked(
        e0 + ".npy", 2.0, 4.0, next_path=str(src / "3.mp4"),
        chunk_len=CHUNK_SEC, fps=FPS, clip_length=8,
    )
    np.testing.assert_array_equal(npy_frames, mp4_frames)


def test_extract_clips_resizes_on_fallback(chunks, tmp_path):
    """--height/--width must be honoured by the cv2 fallback decode, not
    only the native-ffmpeg branch."""
    from helping_hand_for_egocentric_videos_tpu.cli.extract_clips import extract_one

    p0, _ = chunks
    out = str(tmp_path / "small.npy")
    assert extract_one(p0, out, FPS, height=24, width=32)
    arr = np.load(out)
    assert arr.shape == (CHUNK_FRAMES, 24, 32, 3)


def test_ffmpeg_pipe_decodes_real_mp4(chunks):
    """Deploy-time checklist step (docs/DATA.md): on a host with a real
    ffmpeg binary, drive the native ffmpeg-pipe decoder (the decord
    replacement, base/base_dataset.py:274-323) against a GENUINE mp4 and
    verify frame selection + channel order. Skips where no binary exists
    (this CI image has none — the pipe's CLI surface is covered by the
    fake-ffmpeg shim in tests/test_ffmpeg_path.py instead)."""
    from helping_hand_for_egocentric_videos_tpu.data import native

    if not native.has_ffmpeg():
        pytest.skip("no real ffmpeg binary on PATH (see docs/DATA.md checklist)")
    p0, _ = chunks
    # decode 1 second starting at t=0.5 (global frames 15..44), at the
    # file's native resolution so the stripe decoding stays exact
    frames = native.decode_clip_ffmpeg(p0, 0.5, 1.0, FPS, W, H, 40)
    assert len(frames) >= 25
    idx0 = _decode_idx(frames[0])
    assert abs(idx0 - 15) <= 2  # codec seek tolerance
    ids = [_decode_idx(f) for f in frames[:10]]
    assert ids == sorted(ids) and len(set(ids)) >= 9  # consecutive frames
    zone = frames[0][36:, :, :].reshape(-1, 3).mean(axis=0)
    assert abs(zone[0] - ZONE_RGB[0]) < 40  # RGB (not BGR) output
    assert abs(zone[2] - ZONE_RGB[2]) < 40
