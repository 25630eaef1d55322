"""Checkpoint/resume for long renders.

The reference has no render-state persistence (SURVEY.md section 5); its
additive sample accumulation is checkpoint-friendly though, and we exploit
exactly that: the checkpoint stores (accumulated eye/light sums, per-pixel
sample counts, the next pass index, seed, and a config fingerprint).
Because the RNG is counter-based per (seed, pass, pixel), resuming
continues the identical sample stream.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os

import numpy as np

_VERSION = 1


def config_fingerprint(cfg, width, height) -> str:
    payload = repr((sorted(dataclasses.asdict(cfg).items()), width, height))
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save_checkpoint(path: str, *, eye_sum, light_sum, counts, next_pass: int,
                    seed: int, fingerprint: str) -> None:
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp + ".npz",
        version=_VERSION, eye_sum=eye_sum,
        light_sum=light_sum if light_sum is not None else np.zeros(0),
        counts=counts, next_pass=next_pass, seed=seed,
        fingerprint=fingerprint)
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(src, path)


def load_checkpoint(path: str, fingerprint: str):
    """Returns dict or None (missing / incompatible)."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        if int(z["version"]) != _VERSION:
            return None
        if str(z["fingerprint"]) != fingerprint:
            return None
        return {
            "eye_sum": z["eye_sum"],
            "light_sum": z["light_sum"] if z["light_sum"].size else None,
            "counts": z["counts"],
            "next_pass": int(z["next_pass"]),
            "seed": int(z["seed"]),
        }
