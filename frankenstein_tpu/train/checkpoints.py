"""Orbax checkpointing: params + optimizer state + mutable collections + step.

The reference saves best-val model weights only, as safetensors named
``step_{N}_loss_{L}.safetensors`` (reference:utils/train_utils.py:168-173) —
optimizer state is lost and resume restarts optimization. Here the full
TrainState round-trips; the best-by-val-loss retention policy and the
step/loss directory naming are preserved.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_name(step: int, loss: float) -> str:
    return f"step_{step}_loss_{loss:.4f}"


def save_checkpoint(save_dir: Path, state, step: int, val_loss: float,
                    keep: int = 3) -> Path:
    save_dir = Path(save_dir)
    path = (save_dir / _ckpt_name(step, val_loss)).absolute()
    if path.exists():          # stale dir from an interrupted/previous run
        shutil.rmtree(path, ignore_errors=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    (path / "META.json").write_text(json.dumps(
        {"step": int(step), "val_loss": float(val_loss)}))

    # retention: keep the N best by val loss
    cands = []
    for d in save_dir.glob("step_*_loss_*"):
        meta = d / "META.json"
        if meta.exists():
            cands.append((json.loads(meta.read_text())["val_loss"], d))
    cands.sort(key=lambda t: t[0])
    for _, d in cands[keep:]:
        shutil.rmtree(d, ignore_errors=True)
    return path


def best_checkpoint(save_dir: Path) -> Optional[Path]:
    best = None
    for d in Path(save_dir).glob("step_*_loss_*"):
        meta = d / "META.json"
        if meta.exists():
            vl = json.loads(meta.read_text())["val_loss"]
            if best is None or vl < best[0]:
                best = (vl, d)
    return best[1] if best else None


def restore_checkpoint(path: Path, target_state):
    """Restore into the structure of ``target_state`` (shapes/dtypes guide)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target_state)
