"""Checkpoint save/restore (orbax) with keep-last-k pruning.

Equivalent of the reference's runtime checkpointing
(run/train.py:225-240, utils/train_utils.py:192-205): the trainable
decoder params + optimizer state + step/best-acc are saved every N steps
with the last ``keep`` kept; the frozen backbone is never checkpointed —
it is re-loaded from the released LaviLa weights (run/train.py:433-441).

Compatibility: ``make_optimizer`` moved to ``optax.multi_transform``
(grad-None freeze of class_embed/vid_proj, matching the reference's
torch-AdamW skip semantics), which changed the opt_state pytree
structure — optimizer state saved by earlier builds will not restore
against the new template (params restore fine; re-warm the optimizer by
resuming with a fresh ``optimizer.init``).
"""

from __future__ import annotations

import os
import re
import shutil

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step", "PendingSave"]


class PendingSave:
    """Handle for a ``block=False`` save-behind write.

    ``result()`` joins the background write (re-raising any write error)
    and returns the checkpoint dir. Saves submitted while another is in
    flight serialize in submission order on one worker thread.
    """

    def __init__(self, future, target: str):
        self._future = future
        self.target = target

    def result(self, timeout: float | None = None) -> str:
        return self._future.result(timeout)

    def done(self) -> bool:
        return self._future.done()


_SAVE_POOL = None


def _save_pool():
    global _SAVE_POOL
    if _SAVE_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _SAVE_POOL = ThreadPoolExecutor(max_workers=1, thread_name_prefix="hh-ckpt")
    return _SAVE_POOL


def _ckpt_dir(path: str, step: int) -> str:
    return os.path.join(path, f"step_{step:08d}")


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(path)
        if (m := re.match(r"step_(\d+)$", d))
    ]
    return max(steps) if steps else None


def save_checkpoint(path: str, step: int, tree, *, keep: int = 10, block: bool = True):
    """Save an arbitrary pytree (params/opt_state/scalars) at ``step``.

    ``block=False`` (save-behind): the device->host snapshot pull happens
    on the calling thread (so the saved state is consistent no matter how
    the caller mutates it next), then serialization + disk write + keep-k
    pruning run on a background thread; returns a :class:`PendingSave`.
    """
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    target = _ckpt_dir(path, step)
    # block=False needs a true host COPY (np.asarray is a no-copy view of
    # host arrays, which the caller may mutate while the write is in
    # flight); the blocking path keeps the cheaper view
    tree = jax.tree.map(np.asarray if block else np.array, tree)

    def _write() -> str:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(target), tree, force=True)
        ckptr.wait_until_finished()
        steps = sorted(
            int(m.group(1))
            for d in os.listdir(path)
            if (m := re.match(r"step_(\d+)$", d))
        )
        for old in steps[:-keep]:
            shutil.rmtree(_ckpt_dir(path, old), ignore_errors=True)
        return target

    if block:
        return _write()
    return PendingSave(_save_pool().submit(_write), target)


def restore_checkpoint(path: str, step: int | None = None, template=None):
    """Restore the given (or latest) step. ``template`` is a pytree of the
    target structure (required for typed restore)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    ckptr = ocp.StandardCheckpointer()
    target = os.path.abspath(_ckpt_dir(path, step))
    if template is not None:
        tree = ckptr.restore(target, target=jax.tree.map(np.asarray, template))
    else:
        tree = ckptr.restore(target)
    return tree, step
