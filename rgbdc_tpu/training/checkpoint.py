"""Checkpoint save/restore (reference training/trainer.py:204-226 +
utils/IOutils.py:106-111 semantics): every epoch write latest, copy to best
on improvement, periodic snapshots; restore loads params + optimizer state
or — given start_epoch — params only.

Serialization: flax msgpack for the param/opt pytrees + a small JSON sidecar
for scalars. (orbax is available but this format is dependency-light and
self-describing enough for single-host training.)
"""

import json
import shutil
from pathlib import Path

import jax
from flax import serialization


def save_checkpoint(state, epoch: int, loss: float, ckpt_dir: str,
                    is_best: bool = False, snapshot_every: int = 200) -> str:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    latest = ckpt_dir / "checkpoint_latest.msgpack"
    with open(latest, "wb") as f:
        f.write(serialization.to_bytes(payload))
    meta = {"epoch": epoch, "loss": float(loss), "step": int(state.step)}
    (ckpt_dir / "checkpoint_latest.json").write_text(json.dumps(meta))
    if is_best:
        shutil.copyfile(latest, ckpt_dir / "checkpoint_best_loss.msgpack")
        shutil.copyfile(
            ckpt_dir / "checkpoint_latest.json", ckpt_dir / "checkpoint_best_loss.json"
        )
    if snapshot_every and epoch and epoch % snapshot_every == 0:
        shutil.copyfile(latest, ckpt_dir / f"checkpoint_epoch{epoch}.msgpack")
    return str(latest)


def load_params(path: str, params_template):
    """Load just the params tree from any checkpoint file — tolerant of the
    full {params, opt_state, step} payloads save_checkpoint writes AND of
    bare {params} exports (update_model artifacts)."""
    from flax import serialization as ser

    with open(path, "rb") as f:
        raw = ser.msgpack_restore(f.read())
    params = raw.get("params", raw)
    return ser.from_state_dict(params_template, params)


def restore_checkpoint(state, path: str, params_only: bool = False):
    """Returns (state, meta dict). ``state`` must be a template with the
    right tree structure (create_train_state output)."""
    path = Path(path)
    target = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    with open(path, "rb") as f:
        restored = serialization.from_bytes(target, f.read())
    meta_path = path.with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    if params_only:
        state = state.replace(params=restored["params"])
    else:
        state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
    return state, meta
