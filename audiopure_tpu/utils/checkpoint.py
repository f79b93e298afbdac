"""Checkpointing: orbax save/restore with step-numbered directories.

Replaces the reference's three checkpoint styles (SURVEY.md §5): DiffWave's
``${iter}.pkl`` torch pickles (``train.py:131-136``), improved-diffusion's
``model/ema/opt`` blobfiles (``train_util.py:274-297``), and the whole-module
classifier pickles — with one orbax layout:

    <dir>/<step>/   # composite: params (+ ema, opt_state, extra)

``find_max_step`` mirrors ``util.find_max_epoch`` (``util.py:21-43``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def find_max_step(path: str) -> int:
    """Largest integer-named checkpoint dir, -1 if none (ref parity)."""
    if not os.path.isdir(path):
        return -1
    best = -1
    for f in os.listdir(path):
        try:
            best = max(best, int(f))
        except ValueError:
            continue
    return best


_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def save(ckpt_dir: str, step: int, tree: Dict[str, Any],
         async_save: bool = False) -> str:
    """Save a pytree dict (e.g. {'params':..., 'opt_state':..., 'ema':...}).

    With ``async_save`` the call returns as soon as the arrays are copied
    to host (~ms) and the serialization commits in a background thread —
    training steps overlap the checkpoint write. Call ``wait_for_saves()``
    (or save synchronously) before exiting the process.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    if async_save:
        global _async_ckptr
        if _async_ckptr is None:
            _async_ckptr = ocp.AsyncCheckpointer(
                ocp.PyTreeCheckpointHandler())
        _async_ckptr.wait_until_finished()  # one write in flight at a time
        _async_ckptr.save(path, tree, force=True)
        return path
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint write has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def restore(ckpt_dir: str, step: Optional[int] = None,
            template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore the given (or latest) step. ``template`` provides the tree
    structure/shardings for typed restore."""
    if step is None:
        step = find_max_step(ckpt_dir)
        if step < 0:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=template)
        return ckptr.restore(path)


# ---------------------------------------------------------------------------
# self-describing model checkpoints (the reference's whole-module pickles,
# ``audio_models/create_model.py:8``, become params + a meta.json sidecar)
# ---------------------------------------------------------------------------

def save_model(ckpt_dir: str, variables: Dict[str, Any],
               meta: Dict[str, Any]) -> str:
    """Save model variables + JSON metadata (model_name, num_classes, ...)."""
    import json

    path = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "variables"), variables, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_model(ckpt_dir: str):
    """Returns (variables, meta). The CLI-level ``create_model(path)``."""
    import json

    path = os.path.abspath(ckpt_dir)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with ocp.PyTreeCheckpointer() as ckptr:
        variables = ckptr.restore(os.path.join(path, "variables"))
    return variables, meta
