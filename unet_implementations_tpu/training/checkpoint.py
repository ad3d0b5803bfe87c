"""Orbax checkpointing with the reference's cadence and artifact semantics.

Reference contract (``Our_UNet/src/train.py:683-739``): a checkpoint bundles
{epoch, model state, optimizer state, scheduler state, best metric, arch
config}; saved to ``checkpoints/checkpoint_epoch_{N}`` every 10 epochs or on
a new best, with ``best_model`` at the output root; ``--resume`` restores all
states and continues at epoch+1 (``:888-902``). Here the model/optimizer
state is an Orbax PyTree directory, and the scalar metadata + arch config is
a JSON sidecar inside it (the scheduler needs no state — the LR is a pure
function of the epoch).

The cross-phase encoder-transfer contract (SURVEY §3.3) is implemented by
``extract_encoder_params``: restore an AE checkpoint's params and take the
``encoder_{i}`` sub-trees — a plain PyTree sub-tree copy, replacing the
reference's state-dict prefix stripping
(``transfer_learning/models/unet.py:419-448``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from unet_implementations_tpu.training.train_state import TrainState

META_FILE = "meta.json"


def _to_saveable(state: TrainState) -> Dict[str, Any]:
    return {"step": state.step, "params": state.params, "opt_state": state.opt_state}


def save_checkpoint(
    path: str | Path,
    state: TrainState,
    epoch: int,
    best_metric: float,
    config: Optional[Dict] = None,
    early_stopping: Optional[Dict] = None,
) -> None:
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_saveable(state), force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": int(epoch), "best_metric": float(best_metric), "config": config or {}}
    if early_stopping is not None:
        meta["early_stopping"] = early_stopping
    (path / META_FILE).write_text(json.dumps(meta, indent=4))


def restore_checkpoint(
    path: str | Path, state: TrainState
) -> Tuple[TrainState, Dict]:
    """Restore into the structure of ``state``; returns (state, meta)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, _to_saveable(state))
    restored = ckptr.restore(path, abstract)
    meta = json.loads((path / META_FILE).read_text()) if (path / META_FILE).exists() else {}
    return (
        state.replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
        ),
        meta,
    )


def restore_params(path: str | Path, abstract_params: Any) -> Any:
    """Restore only the params sub-tree of a checkpoint (for evaluation)."""
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_params)
    restored = ckptr.restore(
        path, args=ocp.args.PyTreeRestore(item={"params": abstract}, partial_restore=True)
    )
    return restored["params"]


def extract_encoder_params(
    ae_checkpoint_path: str | Path, unet_params: Any, n_stages: int = 6
) -> Any:
    """Graft an AE checkpoint's encoder sub-trees into UNet params.

    Shapes must match exactly (they do: identical encoder topology). Returns
    a new params tree; the caller freezes the sub-trees via
    ``training.train_state.with_frozen``.
    """
    encoder_keys = [f"encoder_{i}" for i in range(n_stages)]
    abstract = {k: unet_params[k] for k in encoder_keys}
    path = Path(ae_checkpoint_path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    abstract_sd = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract)
    restored = ckptr.restore(
        path,
        args=ocp.args.PyTreeRestore(
            item={"params": abstract_sd}, partial_restore=True
        ),
    )
    new_params = dict(unet_params)
    for k in encoder_keys:
        new_params[k] = restored["params"][k]
    return new_params


def read_meta(path: str | Path) -> Dict:
    p = Path(path) / META_FILE
    return json.loads(p.read_text()) if p.exists() else {}
