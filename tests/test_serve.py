"""Serving layer: bucketed micro-batching engine + HTTP front end.

Engine invariants under test: results identical to direct EvalModel
calls (padding is masked out), concurrent requests coalesce into fewer
device calls, oversized requests chunk at the largest bucket, and the
zero-dependency HTTP server round-trips all four routes.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from test_harness import RES, tiny_eval_model  # noqa: F401

from helping_hand_for_egocentric_videos_tpu.serve import ServeConfig, ServingEngine

T = 4
CLIP = (T, RES, RES, 3)


def _clips(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, *CLIP)) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def engine():
    model = tiny_eval_model(t=T)
    eng = ServingEngine(
        model, video_shape=CLIP, cfg=ServeConfig(buckets=(1, 2, 4), max_wait_ms=2.0)
    )
    yield eng
    eng.close()


def test_engine_matches_direct_calls_with_padding(engine):
    texts = ["wash hands", "cut onion", "open fridge"]  # 3 -> bucket 4
    video = _clips(3)
    emb_t = engine.submit_text(texts)
    emb_v, boxes = engine.submit_video(video)
    want_t = engine.model.embed_text(texts)
    want_v, want_b = engine.model.embed_video(video)
    np.testing.assert_allclose(emb_t, want_t, atol=1e-5)
    np.testing.assert_allclose(emb_v, want_v, atol=1e-5)
    np.testing.assert_allclose(boxes, want_b, atol=1e-5)
    assert engine.stats["video"].snapshot()["padded_items"] >= 1


def test_engine_rejects_wrong_clip_shape(engine):
    with pytest.raises(ValueError, match="deployment shape"):
        engine.submit_video(np.zeros((1, T, RES + 14, RES, 3), np.uint8))


def test_engine_rejects_bad_payloads(engine):
    with pytest.raises(ValueError, match="empty"):
        engine.submit_text([])
    with pytest.raises(ValueError, match="empty"):
        engine.submit_video(np.zeros((0, *CLIP), np.uint8))
    # a float clip would silently double-normalize and jit a fresh
    # dtype-specialized program mid-traffic
    with pytest.raises(ValueError, match="uint8"):
        engine.submit_video(np.zeros((1, *CLIP), np.float32))


def test_engine_coalesces_concurrent_requests(engine):
    n = 6
    video = _clips(n, seed=1)
    want, _ = engine.model.embed_video(video)
    calls_before = engine.stats["video"].snapshot()["device_calls"]
    results = [None] * n
    barrier = threading.Barrier(n)

    def worker(i):
        barrier.wait()
        emb, _ = engine.submit_video(video[i : i + 1])
        results[i] = emb[0]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t_ in threads:
        t_.start()
    for t_ in threads:
        t_.join()
    for i in range(n):
        np.testing.assert_allclose(results[i], want[i], atol=1e-5)
    calls = engine.stats["video"].snapshot()["device_calls"] - calls_before
    # 6 one-clip requests over buckets (1,2,4): coalescing must beat
    # per-request dispatch
    assert calls < n, calls


def test_engine_chunks_oversized_request(engine):
    n = 9  # > largest bucket (4): 4 + 4 + 1
    video = _clips(n, seed=2)
    calls_before = engine.stats["video"].snapshot()["device_calls"]
    emb, _ = engine.submit_video(video)
    want, _ = engine.model.embed_video(video)
    np.testing.assert_allclose(emb, want, atol=1e-5)
    assert engine.stats["video"].snapshot()["device_calls"] - calls_before == 3


def _post(url, body, content_type="application/json"):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": content_type}
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_server_end_to_end(monkeypatch):
    """cli.serve: warmup, all four routes, shape/route error paths."""
    from helping_hand_for_egocentric_videos_tpu.cli import serve as serve_cli
    from helping_hand_for_egocentric_videos_tpu.train import evaluate as eval_mod

    model = tiny_eval_model(t=T)
    monkeypatch.setattr(
        serve_cli.common, "build_eval_model", lambda args: (model, None, None)
    )
    stop = threading.Event()
    holder = {}
    ready_evt = threading.Event()

    def ready(srv, engine):
        holder["port"] = srv.server_address[1]
        holder["engine"] = engine
        ready_evt.set()

    th = threading.Thread(
        target=serve_cli.main,
        args=(
            [
                "--port", "0",
                "--num_frames", str(T),
                "--clip_hw", str(RES), str(RES),
                "--buckets", "1", "2", "4",
                "--warmup_buckets", "1",
            ],
        ),
        kwargs={"ready": ready, "stop": stop},
        daemon=True,
    )
    th.start()
    assert ready_evt.wait(timeout=300), "server did not come up"
    base = f"http://127.0.0.1:{holder['port']}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["video_shape"] == list(CLIP)
        assert health["stats"]["video"]["requests"] >= 1  # warmup counted

        texts = ["pour water", "close drawer"]
        code, out = _post(
            base + "/embed_text", json.dumps({"texts": texts}).encode()
        )
        assert code == 200
        np.testing.assert_allclose(
            np.asarray(out["embeddings"]), model.embed_text(texts), atol=1e-5
        )

        video = _clips(2, seed=3)
        buf = io.BytesIO()
        np.save(buf, video)
        code, out = _post(
            base + "/embed_video?boxes=1", buf.getvalue(), "application/x-npy"
        )
        assert code == 200
        want_v, want_b = model.embed_video(video)
        np.testing.assert_allclose(np.asarray(out["embeddings"]), want_v, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["boxes"]), want_b, atol=1e-5)

        buf = io.BytesIO()
        np.savez(buf, video=video, texts=np.asarray(texts))
        code, out = _post(base + "/similarity", buf.getvalue(), "application/x-npz")
        assert code == 200
        want_sim = eval_mod._cos(model.embed_text(texts), want_v)
        np.testing.assert_allclose(np.asarray(out["sim"]), want_sim, atol=1e-5)

        code, out = _post(base + "/nope", b"{}")
        assert code == 404
        code, out = _post(base + "/embed_text", b"not json")
        assert code == 400 and "error" in out
        code, out = _post(base + "/embed_text", b'{"texts": []}')
        assert code == 400 and "empty" in out["error"]
        # wrong clip shape -> engine ValueError -> 400
        buf = io.BytesIO()
        np.save(buf, np.zeros((1, T, RES, RES + 14, 3), np.uint8))
        code, out = _post(base + "/embed_video", buf.getvalue(), "application/x-npy")
        assert code == 400 and "deployment shape" in out["error"]
        # a bare string must not silently embed per-character
        code, out = _post(base + "/embed_text", b'{"texts": "wash hands"}')
        assert code == 400 and "list of strings" in out["error"]
        # engine failure -> structured 500, never a dropped socket
        holder["engine"].close()
        code, out = _post(
            base + "/embed_text", json.dumps({"texts": texts}).encode()
        )
        assert code == 500 and "engine closed" in out["error"]
    finally:
        stop.set()
        th.join(timeout=30)
    assert not th.is_alive()


def test_health_is_device_free_and_detects_stall(engine, monkeypatch):
    """health() must answer without touching jax (a wedged tunnel blocks
    every device call forever — /healthz is how a watchdog finds out) and
    flag 'device_stalled' when a device call exceeds the threshold."""
    h = engine.health()
    assert h["status"] == "ok"
    assert h["devices"] >= 1 and h["backend"]
    assert h["device_busy_s"] == 0.0
    assert h["last_device_call_age_s"] >= 0.0

    # wedge: a device call that never returns (until we release it).
    # Fresh engine with a tiny stall threshold (ServeConfig is frozen).
    import time as _time

    eng2 = ServingEngine(
        engine.model,
        video_shape=CLIP,
        cfg=ServeConfig(buckets=(1, 2, 4), max_wait_ms=2.0, stall_threshold_s=0.05),
    )
    try:
        release = threading.Event()
        orig = engine.model.embed_tokens

        def hanging(tokens):
            release.wait(10.0)
            return orig(tokens)

        monkeypatch.setattr(eng2.model, "embed_tokens", hanging)
        t = threading.Thread(target=lambda: eng2.submit_text(["stuck"]), daemon=True)
        t.start()
        deadline = _time.time() + 5.0
        stalled = None
        while _time.time() < deadline:
            stalled = eng2.health()
            if stalled["status"] == "device_stalled":
                break
        assert stalled["status"] == "device_stalled"
        assert stalled["device_busy_s"] >= 0.05
        release.set()
        t.join(timeout=10)
        monkeypatch.undo()
        assert eng2.health()["status"] == "ok"  # recovers after completion
    finally:
        release.set()
        eng2.close()
