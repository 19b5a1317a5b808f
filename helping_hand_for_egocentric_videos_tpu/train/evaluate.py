"""Zero-shot evaluation harnesses: EgoMCQ, Epic-Kitchens MIR, EGTEA.

Functional equivalents of the reference's run/test_EgoMCQ.py,
run/test_epic.py and run/test_egtea.py, restructured TPU-first: clips are
processed in fixed-size jitted batches (the reference loops bs=1 eager),
uint8 frames are preprocessed on-device, and similarity/metric math runs
on the host exactly as the reference computes it.

Protocol parity notes:
- EgoMCQ (test_EgoMCQ.py:25-135): per item, 5 candidate clips vs 1 query
  text; text embed = txt_proj(text feature map at EOT); video embed =
  obj_proj(hs[-1])[:, -1]; accuracy split by type.
- Epic (test_epic.py:187-283): sim = cosine(text, video); post-process
  s' = ((s+1)/2).T[:, indexes]; nDCG + mAP both directions, averaged.
- EGTEA (run/test_egtea.py:211-265): 106 label narrations embedded once;
  per video, num_clips windows; logits max-pooled over clips;
  mean-class accuracy (confusion matrix) + top-1.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import (
    calculate_mAP,
    calculate_nDCG,
    egomcq_accuracy_metrics,
    mean_class_accuracy,
)
from ..metrics.ndcg import calculate_IDCG, calculate_k_counts
from ..metrics.sim import sim_matrix
from ..models import lavila as lavila_mod
from ..models import obj_decoder as dec_mod
from ..models.obj_decoder import decoder_forward
from ..ops.preprocess import (
    resize_normalize,
    shortside_centercrop_normalize,
    spatial_crops,
)

__all__ = ["EvalModel", "run_egomcq", "run_epic_mir", "run_egtea"]


@dataclass
class EvalModel:
    """Bundles jitted text/video embedding functions for eval."""

    backbone_params: dict
    lavila_cfg: object
    decoder_params: dict
    dec_cfg: object
    tokenizer: object
    input_res: int = 224
    # 'resize' (squash) | 'shortside' (EGTEA 1-crop) | 'crops3'/'crops6'
    # (LaviLa SpatialCrop multi-crop TTA: embeds come back crop-major as
    # (k*B, E); run_egtea's max-pool over rows covers clips x crops,
    # matching run/test_egtea.py:245-246)
    preprocess: str = "resize"
    dtype: object = jnp.bfloat16
    int8: bool = False  # quantize the visual tower (models/quant.py)
    # per-layer mixed-precision fallback threshold (models/quant.py
    # ``act_outlier_threshold``); None = quantize every layer
    int8_fallback: float | None = None

    def __post_init__(self):
        if self.int8:
            from ..models.quant import quantize_lavila_params

            self.backbone_params = quantize_lavila_params(
                self.backbone_params, act_outlier_threshold=self.int8_fallback
            )
        lcfg, dcfg = self.lavila_cfg, self.dec_cfg

        @jax.jit
        def _embed_text(backbone_params, decoder_params, tokens):
            from ..models.clip_text import encode_text

            _, fmap = encode_text(backbone_params["text"], lcfg.text, tokens)
            eot = jnp.argmax(tokens, axis=-1)
            return dec_mod.txt_proj(
                decoder_params, fmap[jnp.arange(tokens.shape[0]), eot]
            )

        @partial(jax.jit, static_argnames=("prep",))
        def _embed_video(backbone_params, decoder_params, video_u8, prep):
            if prep == "resize":
                video = resize_normalize(video_u8, self.input_res)
            elif prep.startswith("crops"):
                video = spatial_crops(
                    video_u8,
                    crop=self.input_res,
                    num_crops=int(prep[5:]),
                    short=self.input_res,
                )
                video = video.reshape((-1,) + video.shape[2:])
            else:
                video = shortside_centercrop_normalize(video_u8, res=self.input_res)
            _, fmap = lavila_mod.encode_image(
                backbone_params, lcfg, video, use_remat=False, dtype=self.dtype
            )
            b, t = video.shape[:2]
            n = lcfg.visual.patches_per_frame
            grid = fmap[:, 1:, :].reshape(b, t, n, -1)
            out = decoder_forward(decoder_params, dcfg, grid)
            video_embed = dec_mod.obj_proj(decoder_params, out.hs[-1])[:, -1]
            return video_embed, out.pred_boxes

        self._embed_text = _embed_text
        self._embed_video = _embed_video

    def embed_text(self, texts: list[str]) -> np.ndarray:
        return self.embed_tokens(np.asarray(self.tokenizer(texts)))

    def embed_tokens(self, tokens: np.ndarray) -> np.ndarray:
        """Batch entry on pre-tokenized (B, 77) input — the serving path
        tokenizes per request and batches token arrays across requests."""
        return np.asarray(
            self._embed_text(
                self.backbone_params, self.decoder_params, jnp.asarray(tokens)
            )
        )

    def embed_video(self, video_u8: np.ndarray):
        emb, boxes = self._embed_video(
            self.backbone_params,
            self.decoder_params,
            jnp.asarray(video_u8),
            self.preprocess,
        )
        return np.asarray(emb), np.asarray(boxes)


def _cos(a, b):
    return np.asarray(sim_matrix(jnp.asarray(a), jnp.asarray(b)))


def _prefetch_items(dataset, n: int, depth: int = 16):
    """Yield dataset[0..n) in order, decoded ahead by a background thread.

    The reference harness loops a bs=1 DataLoader whose workers prefetch
    (run/test_EgoMCQ.py:56); a plain ``dataset[i]`` loop would instead
    serialize host decode against device compute. Depth ~2 batches keeps
    the device fed while bounding memory.
    """
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()
    cancelled = threading.Event()

    def _put(item) -> bool:
        # bounded put that notices consumer abandonment, so a dropped
        # generator (e.g. embed_video raised mid-harness) can't leave the
        # producer blocked forever holding `depth` decoded clips
        while not cancelled.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for i in range(n):
                if not _put(dataset[i]):
                    return
        except BaseException as e:
            _put(e)
        finally:
            _put(stop)

    threading.Thread(target=produce, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        cancelled.set()


def _reject_multicrop(model):
    """crops3/6 preprocess returns crop-major (k*B, E) embeddings; only
    run_egtea's row max-pool is shape-agnostic to that."""
    if getattr(model, "preprocess", "").startswith("crops"):
        raise ValueError(
            "multi-crop preprocess returns crop-major (k*B, E) embeddings; "
            "only run_egtea's row max-pool supports it (use preprocess="
            "'resize' here)"
        )


def run_egomcq(
    model: EvalModel,
    dataset,
    limit: int | None = None,
    progress=None,
    items_per_batch: int = 4,
    out_sims: str | None = None,
):
    """-> {'Intra-video': %, 'Inter-video': %}.

    The reference iterates bs=1 (one MCQ item = 5 candidate clips per
    step, run/test_EgoMCQ.py:56-58); here ``items_per_batch`` items are
    fused into one device batch of 5*K clips to amortise dispatch.
    ``out_sims`` dumps an .npz of the raw per-item similarity rows, ground
    truth and types for offline diffing (the reference saves an equivalent
    .pth, run/test_EgoMCQ.py:119).
    """
    _reject_multicrop(model)
    preds, gts, types = [], [], []
    n = len(dataset) if limit is None else min(limit, len(dataset))
    buf = []

    def flush():
        if not buf:
            return
        k = len(buf)
        videos = np.concatenate([it["video"] for it in buf])  # (5K, T, H, W, C)
        texts = [it["text"] for it in buf]
        video_embeds, _ = model.embed_video(videos)
        text_embeds = model.embed_text(texts)  # (K, E)
        n_opts = buf[0]["video"].shape[0]
        for j, it in enumerate(buf):
            sim = _cos(text_embeds[j : j + 1], video_embeds[j * n_opts : (j + 1) * n_opts])
            preds.append(sim[0])
            gts.append(it["correct"])
            types.append(it["type"])
        buf.clear()

    for i, item in enumerate(_prefetch_items(dataset, n, depth=4 * items_per_batch)):
        buf.append(item)
        if len(buf) == items_per_batch:
            flush()
        if progress and i % 50 == 0:
            progress(i, n)
    flush()
    preds = np.stack(preds)
    if out_sims:
        np.savez(
            out_sims, sims=preds, gt=np.asarray(gts), types=np.asarray(types)
        )
    metrics = egomcq_accuracy_metrics(preds, np.asarray(gts), np.asarray(types))
    metrics["n_items"] = n
    return metrics


def run_epic_mir(
    model: EvalModel,
    dataset,
    relevancy: np.ndarray,
    indexes: np.ndarray,
    batch_size: int = 8,
    progress=None,
    out_sims: str | None = None,
):
    """-> dict of mAP/nDCG (VT/TV/AVG). ``relevancy``/``indexes`` are the
    EPIC relevancy matrix and caption column re-index (test_epic.py:99-101).
    ``out_sims`` dumps an .npz with the raw text x video cosine matrix
    (pre-postprocessing, what the reference torch.saves at
    run/test_epic.py:263-265) plus the re-indexed matrix fed to nDCG/mAP."""
    _reject_multicrop(model)
    text_embeds, vid_embeds = [], []
    n = len(dataset)
    buf_v, buf_t = [], []

    def flush():
        if not buf_v:
            return
        video = np.stack(buf_v)
        emb, _ = model.embed_video(video)
        vid_embeds.append(emb)
        text_embeds.append(model.embed_text(list(buf_t)))
        buf_v.clear()
        buf_t.clear()

    for i, item in enumerate(_prefetch_items(dataset, n, depth=4 * batch_size)):
        buf_v.append(item["video"])
        buf_t.append(item["text"])
        if len(buf_v) == batch_size:
            flush()
        if progress and i % 100 == 0:
            progress(i, n)
    flush()

    text_embeds = np.concatenate(text_embeds)
    vid_embeds = np.concatenate(vid_embeds)
    sim = _cos(text_embeds, vid_embeds)  # (n_caps, n_vids)

    raw_sim = sim
    sim = ((sim + 1) / 2).T[:, indexes]  # (n_vids, n_caps_selected)
    if out_sims:
        np.savez(out_sims, pred=raw_sim, processed=sim)
    k_v = calculate_k_counts(relevancy)
    idcg_v = calculate_IDCG(relevancy, k_v)
    k_t = calculate_k_counts(relevancy.T)
    idcg_t = calculate_IDCG(relevancy.T, k_t)
    vis_nDCG = calculate_nDCG(sim, relevancy, k_v, IDCG=idcg_v)
    txt_nDCG = calculate_nDCG(sim.T, relevancy.T, k_t, IDCG=idcg_t)
    vis_mAP = calculate_mAP(sim, relevancy)
    txt_mAP = calculate_mAP(sim.T, relevancy.T)
    return {
        "nDCG_VT": float(vis_nDCG),
        "nDCG_TV": float(txt_nDCG),
        "nDCG_AVG": float((vis_nDCG + txt_nDCG) / 2),
        "mAP_VT": float(vis_mAP),
        "mAP_TV": float(txt_mAP),
        "mAP_AVG": float((vis_mAP + txt_mAP) / 2),
    }


def run_egtea(model: EvalModel, dataset, labels: list[str], progress=None):
    """-> {'mean_class_acc': %, 'top1': %}. ``labels`` = 106 narrations."""
    label_embeds = model.embed_text(labels)
    num_classes = len(labels)
    preds, gts = [], []
    label_to_idx = {l: i for i, l in enumerate(labels)}
    n = len(dataset)
    for i, item in enumerate(_prefetch_items(dataset, n, depth=4)):
        frames = item["video"]  # (num_clips*clip_length, H, W, C)
        t = model.dec_cfg.num_frames
        clips = frames.reshape(-1, t, *frames.shape[1:])
        emb, _ = model.embed_video(clips)  # (num_clips, E)
        logits = _cos(emb, label_embeds)  # (num_clips, C)
        preds.append(int(np.argmax(logits.max(axis=0))))
        gts.append(label_to_idx[item["label_text"]])
        if progress and i % 50 == 0:
            progress(i, n)
    mca, top1 = mean_class_accuracy(np.asarray(preds), np.asarray(gts), num_classes)
    return {"mean_class_acc": mca, "top1": top1}
