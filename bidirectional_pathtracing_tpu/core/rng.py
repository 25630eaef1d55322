"""Counter-based per-lane PRNG helpers.

Every random decision in the renderer derives from a per-sample key
(fold_in of the pass key with the GLOBAL pixel id) plus a static site
constant.  Randomness therefore depends only on (seed, pass, pixel,
site) — never on array shapes — so renders are bitwise identical under any
device-mesh sharding (replacing the reference's thread-shared Mersenne
Twister, src/util/random_util.h, which gives no determinism at all).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lane_keys(key, lane_ids):
    """One key per lane: fold_in(key, id) vectorized."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(lane_ids)


def fold(keys, const: int):
    """Per-lane fold_in with a static site constant."""
    return jax.vmap(lambda k: jax.random.fold_in(k, const))(keys)


def uniform(keys, suffix=()):
    """Per-lane uniforms: returns [S, *suffix]."""
    return jax.vmap(lambda k: jax.random.uniform(k, suffix))(keys)


def randint(keys, maxval: int):
    """Per-lane uniform int in [0, maxval)."""
    return jax.vmap(lambda k: jax.random.randint(k, (), 0, maxval))(keys)
