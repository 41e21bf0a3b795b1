"""Orbax checkpointing: save/restore params + optimizer state + step.

Replaces the reference's DeepSpeed engine checkpoints
(magma/utils.py:89-117: save_checkpoint with {global_step, config} client
state, `latest` tag, resume returning the step).  Layout:

    {save_dir}/step_{n}/...      — Orbax composite checkpoint
    {save_dir}/latest            — text file naming the newest step dir
    {save_dir}/config.yml        — config dump (parity: utils.py:92-94)
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import yaml

import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(
    save_dir: str,
    global_step: int,
    params: Dict,
    state: Optional[Dict] = None,
    opt_state: Any = None,
    config=None,
) -> str:
    """Save a full training checkpoint; writes the `latest` tag last so a
    crash mid-save never corrupts resume."""
    save_dir = Path(save_dir)
    os.makedirs(save_dir, exist_ok=True)
    if config is not None:
        with open(save_dir / "config.yml", "w") as f:
            yaml.dump(config.to_dict(), f, default_flow_style=False)

    step_dir = (save_dir / f"step_{global_step}").absolute()
    payload = {"params": params}
    if state is not None:
        payload["state"] = state
    if opt_state is not None:
        payload["opt_state"] = opt_state

    # Snapshot to host memory first: Orbax/TensorStore's per-array device
    # reads are pathologically slow through tunneled TPU transports (~150 s
    # per save observed via axon), while a bulk jax.device_get is fast.
    import numpy as np

    payload = jax.tree_util.tree_map(np.asarray, payload)  # bf16 via ml_dtypes

    ckptr = _checkpointer()
    ckptr.save(step_dir, payload, force=True)
    ckptr.wait_until_finished()

    with open(save_dir / "latest", "w") as f:
        f.write(f"step_{global_step}")
    return str(step_dir)


def latest_step_dir(save_dir: str) -> Optional[Path]:
    tag = Path(save_dir) / "latest"
    if not tag.exists():
        return None
    step_dir = Path(save_dir) / tag.read_text().strip()
    return step_dir if step_dir.exists() else None


def load_checkpoint(
    load_dir: str,
    params_template: Dict,
    state_template: Optional[Dict] = None,
    opt_state_template: Any = None,
) -> Tuple[Optional[Dict], Optional[Dict], Any, int]:
    """Restore (params, state, opt_state, global_step).  Returns
    (None, None, None, 0) when nothing restorable exists — the caller
    starts from scratch, matching utils.py:105-117."""
    step_dir = latest_step_dir(load_dir)
    if step_dir is None:
        print(f"Model loading failed from {load_dir} - starting from global step 0")
        return None, None, None, 0

    template = {"params": params_template}
    if state_template is not None:
        template["state"] = state_template
    if opt_state_template is not None:
        template["opt_state"] = opt_state_template

    restored = _checkpointer().restore(step_dir.absolute(), template)
    step = int(str(step_dir.name).split("_")[-1])
    return (
        restored["params"],
        restored.get("state"),
        restored.get("opt_state"),
        step,
    )


def restore_params(
    ckpt_dir: str, params_template: Dict, state_template: Optional[Dict]
) -> Tuple[Dict, Optional[Dict]]:
    """Inference-time restore: params (+ batch stats) only.  Accepts either
    a save root (with `latest`) or a concrete step directory."""
    root = Path(ckpt_dir)
    step_dir = latest_step_dir(ckpt_dir) or root
    template = {"params": params_template}
    if state_template is not None:
        template["state"] = state_template
    try:
        restored = _checkpointer().restore(step_dir.absolute(), template)
    except Exception:
        # tolerate checkpoints saved without state (strict=False spirit,
        # magma.py:297)
        restored = _checkpointer().restore(
            step_dir.absolute(), {"params": params_template}
        )
        return restored["params"], state_template
    return restored["params"], restored.get("state", state_template)
