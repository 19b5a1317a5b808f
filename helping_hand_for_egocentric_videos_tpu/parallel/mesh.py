"""Device mesh construction and sharding rules.

The reference scales with NCCL data-parallelism only (per-rank
DistributedSampler + a hand-written differentiable all_gather,
run/train.py:31-47, base/base_data_loader.py:114-135). Here the same math
runs as a single jit-compiled program over a ``jax.sharding.Mesh``:

- ``data`` axis: batch sharding (DP). The contrastive loss is computed on
  the global similarity matrix; XLA inserts the all-gather over ICI and
  the slice-backward automatically — including the gradient averaging the
  reference silently skips for its box/word losses (no DDP wrapper,
  run/train.py:475; see SURVEY.md §2.5).
- ``model`` axis: optional tensor-parallel sharding of the frozen
  backbone's large matrices (qkv / MLP / vocab embedding), for headroom at
  eval batch sizes; ViT-L fits one chip so the default mesh uses
  model=1.

All rules are expressed as ``NamedSharding`` trees applied with
``jax.device_put`` / ``jax.lax.with_sharding_constraint``; no explicit
collectives are written anywhere in the framework outside the Pallas
kernels.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharding",
    "shard_batch",
    "lavila_param_sharding",
    "DATA_AXIS",
    "MODEL_AXIS",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """(n_devices/model_parallel, model_parallel) mesh over ('data','model').

    On real TPU slices the device grid comes from ``mesh_utils`` so the
    model axis rides ICI-adjacent links; host-local CPU meshes fall back
    to a plain reshape (keeps each host's data shard on its own devices).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    shape = (n // model_parallel, model_parallel)
    if devices[0].platform == "tpu" and devices == jax.devices():
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh(shape, devices=devices)
            return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
        except Exception:
            pass  # odd topologies: fall through to the plain reshape
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """device_put every array in a pytree with its batch dim sharded."""
    return jax.tree.map(
        lambda a: jax.device_put(a, batch_sharding(mesh, np.ndim(a))), batch
    )


def _spec_for_path(path: str, shape) -> P:
    """Tensor-parallel rules for LaviLa backbone parameters.

    Stacked block params carry a leading layer dim; we shard the widest
    weight dimension on the model axis:
      qkv / mlp_fc / attention-out projections -> shard the out (or in)
      feature dim; token embedding -> shard vocab.
    """
    ndim = len(shape)
    if "token_embedding" in path:
        return P(MODEL_AXIS, None)
    if "blocks" in path and ndim == 3:  # stacked (L, in, out)
        if any(k in path for k in ("qkv", "mlp_fc1", "mlp_fc", "wq", "wk", "wv")):
            return P(None, None, MODEL_AXIS)
        if any(k in path for k in ("mlp_fc2", "mlp_proj", "proj", "wo")):
            return P(None, MODEL_AXIS, None)
    return P()


def lavila_param_sharding(mesh: Mesh, params):
    """NamedSharding tree for the (frozen) backbone params."""

    def rule(path, leaf):
        keys = "/".join(
            getattr(p, "key", getattr(p, "idx", None)) or str(p) for p in path
        )
        return NamedSharding(mesh, _spec_for_path(keys, np.shape(leaf)))

    return jax.tree_util.tree_map_with_path(rule, params)
