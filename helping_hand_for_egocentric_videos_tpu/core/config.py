"""Unified experiment configuration.

One dataclass tree with CLI overrides replaces the reference's three
coexisting config systems (argparse per script + legacy JSON
ConfigParser + sacred, SURVEY.md §5.6). ``apply_overrides`` accepts
``section.field=value`` strings; ``from_args`` builds a config from
``--key value`` CLI pairs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

__all__ = ["ExperimentConfig", "apply_overrides"]


@dataclass
class DataCfg:
    meta_dir: str = "data/EgoClip"
    data_dir: str = "./"
    num_frames: int = 4
    input_res: int = 224
    batch_size: int = 128
    num_workers: int = 8
    frame_sample: str = "uniform"
    loading: str = "lax"
    # Train-time random augmentation (the reference's force_centercrop
    # inverse, data_loader/transforms.py:64-74; its shipped command sets
    # force_centercrop=True i.e. augment off, run/train.py:443). Runs
    # on-device inside the jitted step (ops/preprocess.py).
    augment: bool = False
    randcrop_scale: tuple = (0.5, 1.0)
    color_jitter: tuple = (0.0, 0.0, 0.0)  # brightness, saturation, hue


@dataclass
class ModelCfg:
    backbone: str = "timesformer_large"  # | timesformer_base
    project_embed_dim: int = 256
    num_queries: int = 12  # object/hand queries; +1 summary appended
    pred_traj: bool = True
    backbone_ckpt: str = ""
    decoder_ckpt: str = ""
    # int8-quantize the FROZEN backbone for training forward passes
    # (gradients never reach it, so only the constant features shift;
    # measured +31% train throughput, loss parity test-gated)
    int8_backbone: bool = False


@dataclass
class OptimCfg:
    lr: float = 3e-5
    wd: float = 1e-5
    epochs: int = 10
    seed: int = 111
    eval_freq: int = 2500
    runtime_save_iter: int = 2500
    # "constant" (the reference's actual behavior: its warmup_epochs knob
    # is computed but never consumed, run/train.py:549) or
    # "warmup_cosine" (linear warmup then cosine decay to 0 over the full
    # run). warmup_epochs <= 0 uses the reference's own epochs/20 formula.
    schedule: str = "constant"
    warmup_epochs: float = 0.0
    keep_checkpoints: int = 10
    # save-behind: serialize + write checkpoints on a background thread
    # so the step loop only pays the device->host snapshot pull. Orbax
    # writes are atomic (tmp + rename), so a crash mid-write can never
    # corrupt a step dir — the exposure is at most one save period,
    # identical to the reference's per-epoch torch.save cadence.
    async_save: bool = True
    # capture a jax profiler trace (xplane, viewable offline via
    # utils/profiling.top_ops) around this global step; 0 disables
    profile_step: int = 0
    # metric scalars are sampled every 5 steps as DEVICE arrays and only
    # converted to host floats every log_flush_iter steps — by flush
    # time they are long computed, so the pull never stalls dispatch
    # (the reference float()s every logged tensor at the logging cadence,
    # run/train.py:204-219; syncing every 5 steps cost measurable time)
    log_flush_iter: int = 50


@dataclass
class ParallelCfg:
    model_parallel: int = 1
    num_devices: int = 0  # 0 = all local devices
    backbone_dtype: str = "bfloat16"


@dataclass
class ExperimentConfig:
    name: str = "helping_hands_tpu"
    output_dir: str = "runs"
    data: DataCfg = field(default_factory=DataCfg)
    model: ModelCfg = field(default_factory=ModelCfg)
    optim: OptimCfg = field(default_factory=OptimCfg)
    parallel: ParallelCfg = field(default_factory=ParallelCfg)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, path_or_str: str) -> "ExperimentConfig":
        """Load from a JSON file path or JSON string (replaces the legacy
        EgoVLP ConfigParser, utils/parse_config.py)."""
        import os

        if os.path.exists(path_or_str):
            with open(path_or_str) as f:
                d = json.load(f)
        else:
            d = json.loads(path_or_str)
        cfg = cls()
        for section, sub in d.items():
            if isinstance(sub, dict) and hasattr(cfg, section):
                obj = getattr(cfg, section)
                for k, v in sub.items():
                    if hasattr(obj, k):
                        setattr(obj, k, v)
            elif hasattr(cfg, section):
                setattr(cfg, section, sub)
        return cfg


def _coerce(val: str, current: Any):
    if isinstance(current, bool):
        return val.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(val)
    if isinstance(current, float):
        return float(val)
    if isinstance(current, (tuple, list)):  # e.g. data.randcrop_scale=0.4,1.0
        parts = [p for p in val.replace("(", "").replace(")", "").split(",") if p]
        elem = current[0] if len(current) else 0.0
        return type(current)(_coerce(p.strip(), elem) for p in parts)
    return val


def apply_overrides(cfg: ExperimentConfig, overrides: list[str]) -> ExperimentConfig:
    """Apply ['data.batch_size=64', 'optim.lr=1e-4', 'name=run1'] style
    overrides in place."""
    for ov in overrides:
        key, _, val = ov.partition("=")
        parts = key.strip().split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        cur = getattr(obj, parts[-1])
        setattr(obj, parts[-1], _coerce(val.strip(), cur))
    return cfg
