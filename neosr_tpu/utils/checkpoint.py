"""Checkpoint save/load for param pytrees and training state.

Replaces the reference's torch.save flows
(/root/reference/neosr/models/base.py:281-496): two artifact kinds —
(1) network weights `models/net_{g,d}_<iter>.ckpt` holding a named param
pytree under a param_key ("params" / "params_ema"), (2) training state
`training_states/<iter>.state` holding step/epoch + optimizer states.
Serialization is flax msgpack (framework-native); `export_safetensors`
writes a flat key->tensor file for ecosystem interop.  Writes are
3-retried like the reference (base.py:330-349).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

from neosr_tpu.utils.logger import get_root_logger


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _retry_write(write_fn, path: Path, retries: int = 3) -> None:
    logger = get_root_logger()
    for attempt in range(retries):
        try:
            write_fn(path)
            return
        except Exception as e:
            logger.warning(f"Save failed ({e}), remaining retry times: {retries - attempt - 1}")
            time.sleep(1)
    msg = f"Still cannot save {path}."
    raise OSError(msg)


def save_pytree(path: str | Path, tree: Any) -> None:
    """Serialize a pytree (host numpy) to msgpack bytes."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = serialization.to_bytes(_to_host(tree))

    def _write(p: Path) -> None:
        tmp = p.with_suffix(p.suffix + ".tmp")
        tmp.write_bytes(data)
        tmp.rename(p)

    _retry_write(_write, path)


def load_pytree(path: str | Path, target: Any | None = None) -> Any:
    """Load msgpack bytes back into a pytree (structured if target given)."""
    data = Path(path).read_bytes()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def flatten_params(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten a nested param dict into {'a.b.c': array} for safetensors."""
    flat: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            flat.update(flatten_params(v, key))
    else:
        flat[prefix] = np.asarray(tree)
    return flat


def unflatten_params(flat: dict[str, np.ndarray]) -> dict[str, Any]:
    tree: dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def export_safetensors(path: str | Path, params: Any, metadata: dict | None = None) -> None:
    from safetensors.numpy import save_file

    flat = flatten_params(_to_host(params))
    flat = {k: np.ascontiguousarray(v) for k, v in flat.items()}
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    save_file(flat, str(path), metadata=metadata or {})


def load_safetensors(path: str | Path) -> dict[str, Any]:
    from safetensors.numpy import load_file

    return unflatten_params(load_file(str(path)))
