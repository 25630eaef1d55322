"""Pallas intersection kernel vs the jnp brute-force oracle (interpret mode
on CPU; the compiled kernel runs on TPU in bench/production)."""

import numpy as np
import jax.numpy as jnp

from bidirectional_pathtracing_tpu.ops.intersect import intersect
from bidirectional_pathtracing_tpu.ops.intersect_pallas import (
    intersect_pallas, make_tri_soa)
from bidirectional_pathtracing_tpu.scene.procedural import make_cornell_box


def test_pallas_matches_brute_force():
    scene = make_cornell_box()
    geom = scene.geometry
    soa = make_tri_soa(geom)
    rng = np.random.default_rng(0)
    n = 700  # not a multiple of the tile to exercise padding
    o = jnp.asarray(rng.uniform(-1.5, 2.0, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    ref = intersect(geom, o, d, 1e-4, 1e30)
    pk = intersect_pallas(geom, soa, o, d, 1e-4, 1e30, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(pk.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(pk.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pk.mat)[m],
                                  np.asarray(ref.mat)[m])
    np.testing.assert_allclose(np.asarray(pk.n)[m], np.asarray(ref.n)[m],
                               atol=1e-5)
    # global prim ids incl. the in-kernel sphere winners (>= num_tris)
    np.testing.assert_array_equal(np.asarray(pk.prim)[m],
                                  np.asarray(ref.prim)[m])
    assert (np.asarray(pk.prim)[m] >= geom.num_tris).any(), \
        "expected some sphere winners in the cornell box"
