"""Checkpoint / resume — a capability the reference lacks.

The reference only ever writes the best-validation state_dict in place
(`/root/reference/model/modelUnet.py:939-943`) and never saves optimizer
state, step, or RNG; a preemption loses the run.  tpuseg checkpoints the
full train state (params, opt state, step, PRNG key, EMA of metrics) with:

 * a best-metric retention policy plus a rolling "latest",
 * resume (restores step + optimizer moments exactly),
 * async background writes so the TPU never waits on disk,
 * host-gather of sharded arrays so a checkpoint written on an N-chip mesh
   restores onto any other mesh (resharding happens on device_put).

Format: ``<dir>/<name>/{meta.json, state.msgpack}`` with msgpack tensor
payload (flax.serialization wire format).
"""
from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    """Fully replicate/gather device arrays to host numpy."""
    def get(x):
        if isinstance(x, jax.Array):
            return np.asarray(jax.device_get(x))
        return np.asarray(x) if isinstance(x, (np.ndarray, float, int)) else x
    return jax.tree_util.tree_map(get, tree)


def save(path: str, state: Any, meta: Optional[dict] = None) -> None:
    """Atomically write a checkpoint directory."""
    host_state = _to_host(state)
    payload = serialization.to_bytes(host_state)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(os.path.abspath(path)) or ".")
    try:
        with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
            f.write(payload)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta or {}, f, indent=2, default=float)
        # never a window with neither old nor new checkpoint on disk:
        # move the old one aside, swing the new one in, then delete
        old = path + ".old"
        if os.path.isdir(path):
            shutil.rmtree(old, ignore_errors=True)
            os.replace(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def _resolve(path: str) -> str:
    """Fall back to the `.old` copy if a crash hit the save()'s swap window."""
    if not os.path.isfile(os.path.join(path, "state.msgpack")) and os.path.isfile(
        os.path.join(path + ".old", "state.msgpack")
    ):
        return path + ".old"
    return path


def restore(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (a template train state)."""
    with open(os.path.join(_resolve(path), "state.msgpack"), "rb") as f:
        payload = f.read()
    return serialization.from_bytes(target, payload)


def read_meta(path: str) -> dict:
    with open(os.path.join(_resolve(path), "meta.json")) as f:
        return json.load(f)


def exists(path: str) -> bool:
    return os.path.isfile(os.path.join(_resolve(path), "state.msgpack"))


def save_sharded(path: str, state: Any, meta: Optional[dict] = None) -> None:
    """Orbax-backed sharded save: each host writes its own array shards —
    the multi-host/TPU-pod path (our msgpack format gathers to host 0).
    Restore with ``restore_sharded``; the restore target's shardings decide
    the new placement, so a checkpoint written on one mesh topology
    restores onto any other (tests/test_core_infra.py pins (2,2,2)→(8,))."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(os.path.abspath(path) + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=float)


def restore_sharded(path: str, target: Any) -> Any:
    """Restore into `target`'s structure.  Leaves that are jax.Arrays (or
    jax.ShapeDtypeStruct with `.sharding`) carry the destination sharding;
    orbax reshards the stored shards onto it regardless of the topology
    the checkpoint was written under."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def read_meta_sharded(path: str) -> dict:
    meta_path = os.path.abspath(path) + ".meta.json"
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


class CheckpointManager:
    """Best + latest retention with async background writes."""

    def __init__(
        self,
        directory: str,
        mode: str = "max",
        async_write: bool = True,
        sharded: bool = False,
    ):
        self.directory = directory
        self.mode = mode
        # orbax's save already overlaps device reads with disk writes and
        # wait_until_finished()s; no extra thread needed on the sharded path
        self.sharded = sharded
        self.async_write = async_write and not sharded
        self._best: Optional[float] = None
        self._thread: Optional[threading.Thread] = None
        os.makedirs(directory, exist_ok=True)
        best = os.path.join(directory, "best")
        try:
            if sharded:
                self._best = read_meta_sharded(best).get("metric")
            elif os.path.isfile(os.path.join(best, "meta.json")):
                self._best = read_meta(best).get("metric")
        except Exception:
            self._best = None

    def _write(self, name: str, host_state, meta):
        save(os.path.join(self.directory, name), host_state, meta)

    def _submit(self, name, state, meta):
        if self.sharded:
            self.wait()
            save_sharded(os.path.join(self.directory, name), state, meta)
            return
        host_state = _to_host(state)  # snapshot before the step buffer is donated
        self.wait()
        if self.async_write:
            self._thread = threading.Thread(
                target=self._write, args=(name, host_state, meta), daemon=True
            )
            self._thread.start()
        else:
            self._write(name, host_state, meta)

    def save_latest(self, state, step: int, metric: Optional[float] = None, **extra):
        meta = {"step": int(step), "metric": metric}
        meta.update(extra)
        self._submit("latest", state, meta)

    def maybe_save_best(self, state, step: int, metric: float) -> bool:
        better = (
            self._best is None
            or (self.mode == "max" and metric > self._best)
            or (self.mode == "min" and metric < self._best)
        )
        if better:
            self._best = float(metric)
            self._submit("best", state, {"step": int(step), "metric": float(metric)})
        return better

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def restore(self, target, which: str = "latest"):
        self.wait()
        path = os.path.join(self.directory, which)
        if self.sharded:
            if not os.path.isdir(path):
                return None
            return restore_sharded(path, target), read_meta_sharded(path)
        if not exists(path):
            return None
        return restore(path, target), read_meta(path)

    @property
    def best_metric(self):
        return self._best
