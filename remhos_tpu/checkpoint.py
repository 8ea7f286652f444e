"""Checkpoint/resume backends (a capability the reference lacks;
SURVEY §5 calls for orbax-style checkpointing on TPU).

Paths ending in .npz use numpy archives (single-host, dependency-free);
any other path is treated as an orbax checkpoint directory
(PyTreeCheckpointer — the TPU-native format, atomic renames, works with
cloud storage paths)."""

from __future__ import annotations

import os

import numpy as np


def _is_npz(path: str) -> bool:
    return path.endswith(".npz")


def save_state(path: str, S, t: float, dt: float, ti: int) -> None:
    state = {"S": np.asarray(S), "t": float(t), "dt": float(dt),
             "ti": int(ti)}
    if _is_npz(path):
        np.savez(path, **state)
        return
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def load_state(path: str):
    """(S, t, dt, ti) from either backend."""
    if _is_npz(path):
        ck = np.load(path)
        return ck["S"], float(ck["t"]), float(ck["dt"]), int(ck["ti"])
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    st = ckptr.restore(os.path.abspath(path))
    return st["S"], float(st["t"]), float(st["dt"]), int(st["ti"])
