"""Training checkpoint save/restore (orbax).

The reference has no training, so its "checkpoints" are artifact folders
(SURVEY.md §5); the training extension here persists (params, opt_state,
step) with orbax so fine-tuning runs can resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def save_train_state(path: str | Path, params: Any, opt_state: Any, step: int) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path / f"step_{step:08d}",
            {"params": params, "opt_state": opt_state, "step": jax.numpy.asarray(step)},
        )


def latest_step(path: str | Path) -> int | None:
    path = Path(path)
    if not path.exists():
        return None
    steps = sorted(int(p.name.split("_")[1]) for p in path.glob("step_*"))
    return steps[-1] if steps else None


def restore_train_state(path: str | Path, template: Any, step: int | None = None):
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path / f"step_{step:08d}", template)
    return restored["params"], restored["opt_state"], int(restored["step"])
