"""Training checkpoint save/resume.

The reference saves per-iteration G/D .pth files and leaves
save_training_state as a TODO (models/base_model.py:78-89); here the FULL
TrainState pytree (params + optimizer moments + step counters) round-trips
through orbax, so resume is exact — optimizer state included.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"ckpt_{step:09d}")


def save_checkpoint(root: str, state: Any, step: int) -> str:
    import orbax.checkpoint as ocp

    path = _ckpt_dir(root, step)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, jax.tree.map(np.asarray, state), force=True)
    return path


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (a freshly created
    TrainState provides dtypes/shapes)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(os.path.abspath(path), item=template)
    return jax.tree.map(lambda t, r: np.asarray(r, dtype=np.asarray(t).dtype), template, restored)


def latest_checkpoint(root: str) -> str | None:
    if not os.path.isdir(root):
        return None
    ckpts = sorted(d for d in os.listdir(root) if d.startswith("ckpt_"))
    return os.path.join(root, ckpts[-1]) if ckpts else None
