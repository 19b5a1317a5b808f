from .tokenizer import ClipTokenizer, CONTEXT_LENGTH, VOCAB_SIZE
from .samplers import (
    get_frame_ids,
    sample_frames,
    sample_frames_clips,
    sample_frames_start_end,
)
from .loader import PrefetchLoader, ShardedSampler, collate, prepare_train_batch

__all__ = [
    "ClipTokenizer",
    "CONTEXT_LENGTH",
    "VOCAB_SIZE",
    "get_frame_ids",
    "sample_frames",
    "sample_frames_clips",
    "sample_frames_start_end",
    "PrefetchLoader",
    "ShardedSampler",
    "collate",
    "prepare_train_batch",
]
