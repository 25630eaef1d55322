"""Counter-based per-lane PRNG helpers.

Every random decision in the renderer derives from a per-sample key
(fold_in of the pass key with the GLOBAL pixel id) plus a static site
constant.  Randomness therefore depends only on (seed, pass, pixel,
site) — never on array shapes — so renders are bitwise identical under any
device-mesh sharding (replacing the reference's thread-shared Mersenne
Twister, src/util/random_util.h, which gives no determinism at all).

Two interchangeable implementations (BDPT_TPU_RNG env var):

  pcg      (default) lane keys are [S, 2] uint32 states mixed with the
           pcg2d hash (Jarzynski & Olano, "Hash Functions for GPU
           Rendering", JCGT 2020 — the recommended renderer hash family):
           ~14 integer VPU ops per draw.  Round-2 profiling measured the
           threefry path at 15% of the whole BDPT step
           (artifacts/profile/), almost all of it in per-site fold_in;
           pcg removes ~4/5 of that at equal render quality (the golden
           block-error tests and the sampler moment tests both pass on
           either stream).
  threefry the original jax.random path (fold_in + threefry2x32 bits),
           kept selectable for A/Bs and for byte-identical reproduction
           of round-2 renders.

The two produce DIFFERENT (both deterministic) sample streams; goldens are
compared statistically against the reference oracle, not bitwise, so the
default changed in round 3 without regenerating them.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

IMPL = os.environ.get("BDPT_TPU_RNG", "pcg")

_INV24 = 1.0 / 16777216.0  # 2^-24: top 24 bits -> [0, 1) float32


def _pcg2d(a, b):
    """pcg2d mix (Jarzynski & Olano eq. pcg2d): full-avalanche 2x32-bit
    hash, vectorizable on the VPU (uint32 mul/add/xor/shift only)."""
    v0 = a * jnp.uint32(1664525) + jnp.uint32(1013904223)
    v1 = b * jnp.uint32(1664525) + jnp.uint32(1013904223)
    v0 = v0 + v1 * jnp.uint32(1664525)
    v1 = v1 + v0 * jnp.uint32(1664525)
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v0 = v0 + v1 * jnp.uint32(1664525)
    v1 = v1 + v0 * jnp.uint32(1664525)
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    return v0, v1


def _is_fast(keys) -> bool:
    return keys.dtype == jnp.uint32


def lane_keys(key, lane_ids):
    """One key per lane: fold_in(key, id) vectorized.

    `key` is always a jax PRNG key (the per-pass key); the returned lane
    keys are impl-dependent ([S] typed keys, or [S, 2] uint32 pcg states).
    """
    if IMPL == "pcg":
        kd = jax.random.key_data(key).astype(jnp.uint32)  # [2]
        ids = lane_ids.astype(jnp.uint32)
        v0, v1 = _pcg2d(kd[0] ^ ids, kd[1] + ids)
        return jnp.stack([v0, v1], axis=-1)               # [S, 2]
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(lane_ids)


def fold(keys, const: int):
    """Per-lane fold_in with a static site constant."""
    if _is_fast(keys):
        c = jnp.uint32(const)
        v0, v1 = _pcg2d(keys[..., 0] ^ (c * jnp.uint32(0x9E3779B9)),
                        keys[..., 1] + c)
        return jnp.stack([v0, v1], axis=-1)
    return jax.vmap(lambda k: jax.random.fold_in(k, const))(keys)


def _fast_bits(keys, n: int):
    """[S, n] independent uint32 words from [S, 2] states."""
    cols = []
    for j in range(n):
        v0, v1 = _pcg2d(keys[..., 0] + jnp.uint32(j) * jnp.uint32(0x632BE59B),
                        keys[..., 1] ^ jnp.uint32(j))
        cols.append(v0 ^ (v1 << 16))
    return jnp.stack(cols, axis=-1)


def uniform(keys, suffix=()):
    """Per-lane uniforms in [0, 1): returns [S, *suffix]."""
    if _is_fast(keys):
        n = 1
        for m in suffix:
            n *= m
        bits = _fast_bits(keys, n)                        # [S, n]
        u = (bits >> 8).astype(jnp.float32) * jnp.float32(_INV24)
        return u.reshape(keys.shape[:-1] + tuple(suffix))
    return jax.vmap(lambda k: jax.random.uniform(k, suffix))(keys)


def randint(keys, maxval: int):
    """Per-lane uniform int in [0, maxval)."""
    if _is_fast(keys):
        bits = _fast_bits(keys, 1)[..., 0]
        # modulo of a full-entropy word: bias < maxval / 2^32, far below
        # render noise for light counts (the reference uses rand() % n,
        # sampler.h:14-30)
        return (bits % jnp.uint32(maxval)).astype(jnp.int32)
    return jax.vmap(lambda k: jax.random.randint(k, (), 0, maxval))(keys)
