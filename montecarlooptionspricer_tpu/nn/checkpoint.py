"""Checkpoint save/load — equivalent of BayesianNN.cpp:286-342 (full
model+optimizer+epoch+loss archive) and :566-580 (final model file).

Serialization is flax msgpack (single file, atomic rename), mirroring the
reference's single-archive LibTorch format.  orbax-checkpoint is the usual
TPU choice, but its async machinery deadlocks in the sandboxed single-host
environment this framework is developed in; the msgpack path is synchronous,
dependency-light, and byte-stable, which the determinism tests rely on.
"""

from __future__ import annotations

import logging
import os
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

log = logging.getLogger(__name__)

_SUFFIX = ".msgpack"


def _atomic_write(path: str, data: bytes) -> None:
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".ckpt-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            # fsync BEFORE the rename: a journaled rename without durable
            # data blocks can atomically replace the previous good
            # checkpoint with a truncated one on power loss — exactly the
            # loss per-epoch checkpointing exists to prevent.
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise


def _normalize(path: str) -> str:
    return path if path.endswith(_SUFFIX) else path + _SUFFIX


def save_checkpoint(path: str, params: Any, opt_state: Any, epoch: int,
                    loss: float, dropout_key=None) -> None:
    """Archive model + optimizer + epoch + loss (BayesianNN.cpp:324-342);
    overwrites in place like the reference's per-epoch checkpoint.
    ``dropout_key`` (raw uint32 key data, jax.random.key_data) is stored
    when given so a resumed run CONTINUES the dropout-mask stream instead
    of replaying it from epoch 1.

    device_get first: it issues all device->host copies concurrently,
    where serializing device arrays leaf-by-leaf pays one transfer round
    trip per tensor (~18 s/epoch through a remote TPU tunnel)."""
    tree = jax.device_get({"params": params, "opt_state": opt_state})
    tree["epoch"] = np.int64(epoch)
    tree["loss"] = np.float64(loss)
    if dropout_key is not None:
        tree["dropout_key"] = np.asarray(dropout_key, np.uint32)
    _atomic_write(_normalize(path), serialization.to_bytes(tree))


def load_checkpoint(path: str, params_template: Any, opt_state_template: Any
                    ) -> Optional[Tuple[Any, Any, int, float, Any]]:
    """Restore (params, opt_state, epoch, loss, dropout_key_or_None);
    None when absent or unreadable — the reference logs and trains from
    scratch on failure (BayesianNN.cpp:286-322, :391-403).  dropout_key is
    None for archives written before the key was checkpointed (flax
    from_bytes restores by exact dict structure, so both templates are
    tried)."""
    path = _normalize(path)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
        base = {"params": params_template,
                "opt_state": opt_state_template,
                "epoch": np.int64(0), "loss": np.float64(0.0)}
        try:
            tree = serialization.from_bytes(
                dict(base, dropout_key=np.zeros(2, np.uint32)), data)
        except Exception:  # noqa: BLE001 — legacy archive without the key
            tree = serialization.from_bytes(base, data)
        return (tree["params"], tree["opt_state"], int(tree["epoch"]),
                float(tree["loss"]), tree.get("dropout_key"))
    except Exception as e:  # noqa: BLE001 — containment, like the reference
        log.error("Error loading checkpoint %s: %s", path, e)
        return None


def save_params(path: str, params: Any) -> None:
    """Final model file (BayesianNN.cpp:566-572)."""
    _atomic_write(_normalize(path),
                  serialization.to_bytes(jax.device_get({"params": params})))


def load_params(path: str, params_template: Any) -> Any:
    """Load a final model file (BayesianNN.cpp:574-580); raises when
    missing, as torch::load does."""
    with open(_normalize(path), "rb") as f:
        data = f.read()
    return serialization.from_bytes({"params": params_template},
                                    data)["params"]
