"""Clustered Pallas kernel vs brute-force oracle (interpret mode on CPU).

Validates the large-scene TPU path (ops/intersect_clustered.py): the
two-level cluster cut must return bitwise-identical hits to the exhaustive
jnp scan for any ray set, including segment-clipped shadow rays.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from bidirectional_pathtracing_tpu.core.math import INF_D
from bidirectional_pathtracing_tpu.ops.intersect import intersect
from bidirectional_pathtracing_tpu.ops.intersect_clustered import (
    intersect_clustered)
from bidirectional_pathtracing_tpu.scene.clusters import build_clusters
from bidirectional_pathtracing_tpu.scene.types import make_geometry


def _random_mesh(n_tris, seed=0, extent=4.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, (n_tris, 1, 3))
    offsets = rng.normal(0, 0.25, (n_tris, 3, 3))
    tri_p = (centers + offsets).astype(np.float32)
    e1 = tri_p[:, 1] - tri_p[:, 0]
    e2 = tri_p[:, 2] - tri_p[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    tri_n = np.repeat(n[:, None, :], 3, axis=1)
    tri_mat = rng.integers(0, 5, (n_tris,)).astype(np.int32)
    return make_geometry(tri_p, tri_n, tri_mat)


def _random_rays(n, seed=1, extent=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("paired", [False, True], ids=["flat", "paired"])
@pytest.mark.parametrize("n_tris,n_rays,seed", [
    (700, 640, 0),      # multiple clusters, partial tile
    (150, 256, 2),      # tiny mesh: exercises odd/partial sub-pairs
    pytest.param(4096, 1024, 7, marks=pytest.mark.slow),  # many blocks
])
def test_clustered_matches_bruteforce(n_tris, n_rays, seed, paired):
    geom = _random_mesh(n_tris, seed=seed)
    clusters = build_clusters(geom, paired=paired)
    assert clusters is not None
    o, d = _random_rays(n_rays, seed=seed + 1)
    ref = intersect(geom, o, d, 1e-4, INF_D)
    got = intersect_clustered(geom, clusters, o, d, 1e-4, INF_D,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    np.testing.assert_array_equal(np.asarray(got.mat), np.asarray(ref.mat))
    hit = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.n)[hit],
                               np.asarray(ref.n)[hit], rtol=1e-5, atol=1e-6)


def test_clustered_segment_window():
    """min_t/max_t clipping must match (shadow-segment semantics,
    bidirection.cpp:423-430)."""
    geom = _random_mesh(900, seed=3)
    clusters = build_clusters(geom, paired=False)
    o, d = _random_rays(512, seed=4)
    min_t = jnp.full((512,), 0.5)
    max_t = jnp.full((512,), 3.0)
    ref = intersect(geom, o, d, min_t, max_t)
    got = intersect_clustered(geom, clusters, o, d, min_t, max_t,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6)


def test_clustered_with_spheres():
    """Sphere merge after the triangle kernel keeps global prim ids."""
    geom = _random_mesh(300, seed=5)
    geom = make_geometry(
        np.asarray(geom.tri_p), np.asarray(geom.tri_n),
        np.asarray(geom.tri_mat),
        sph_c=np.array([[0.0, 0.0, 0.0], [2.0, 1.0, -1.0]]),
        sph_r=np.array([1.0, 0.7]),
        sph_mat=np.array([1, 2], np.int32))
    clusters = build_clusters(geom, paired=False)
    o, d = _random_rays(512, seed=6)
    ref = intersect(geom, o, d, 1e-4, INF_D)
    got = intersect_clustered(geom, clusters, o, d, 1e-4, INF_D,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6)


@pytest.mark.parametrize("paired", [False, True], ids=["flat", "paired"])
def test_clustered_any_hit_matches_occlusion(paired):
    """The early-exit any-hit variant must agree with brute-force
    occlusion for segment-clipped shadow rays."""
    from bidirectional_pathtracing_tpu.ops.intersect import occluded
    from bidirectional_pathtracing_tpu.ops.intersect_clustered import (
        occluded_clustered)
    geom = _random_mesh(900, seed=11)
    clusters = build_clusters(geom, paired=paired)
    o, d = _random_rays(640, seed=12)
    min_t = jnp.full((640,), 1e-3)
    max_t = jnp.full((640,), 4.0)
    ref = occluded(geom, o, d, min_t, max_t)
    got = occluded_clustered(geom, clusters, o, d, min_t, max_t,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_clustered_sparse_walk_bit31():
    """Force a SPARSE survivor word whose highest set bit is 31 (INT_MIN)
    so the sparse while_loop bit walk — not just the dense scan — executes
    over the m & -m two's-complement edge (advisor round-2 finding).

    Geometry: 32 groups of 128 triangles along x (one BVH leaf/cluster
    each, pre-order = x order); groups 1..30 are offset +50 in y, groups 0
    and 31 sit at y=0.  A tile of rays marching along +x at y~0 slab-hits
    only clusters 0 and 31 -> survivor mask 0x80000001, popcount 2.

    Pinned to the midpoint cut: the engineered mask relies on its
    deterministic x-order leaf numbering (the SAH default may reorder
    leaves; the bit-31 edge under test is cut-agnostic)."""
    rng = np.random.default_rng(31)
    groups = []
    for i in range(32):
        cx = i * 100.0
        cy = 0.0 if i in (0, 31) else 50.0
        centers = np.array([cx, cy, 0.0]) + rng.uniform(
            -0.3, 0.3, (128, 1, 3))
        tri = centers + rng.normal(0, 0.1, (128, 3, 3))
        groups.append(tri)
    tri_p = np.concatenate(groups).astype(np.float32)
    n = np.cross(tri_p[:, 1] - tri_p[:, 0], tri_p[:, 2] - tri_p[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    geom = make_geometry(tri_p, np.repeat(n[:, None, :], 3, axis=1),
                         np.zeros((tri_p.shape[0],), np.int32))
    clusters = build_clusters(geom, paired=False, build="midpoint")
    assert clusters.n_clusters == 32 and clusters.n_blocks == 1

    o = np.array([-50.0, 0.0, 0.0]) + rng.uniform(-0.2, 0.2, (256, 3))
    d = np.array([1.0, 0.0, 0.0]) + rng.normal(0, 1e-4, (256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)

    # verify the intended mask from the builder's cluster bounds: exactly
    # clusters 0 and 31 survive the slab test for this tile
    cb = np.asarray(clusters.cluster_b)
    survives = []
    for ci in range(32):
        lo, hi = cb[0:3, ci], cb[3:6, ci]
        any_hit = False
        for k in range(8):   # a few rays suffice — they are near-parallel
            oo, dd = np.asarray(o[k]), np.asarray(d[k])
            with np.errstate(divide="ignore"):
                t0 = (lo - oo) / dd
                t1 = (hi - oo) / dd
            tmin = np.minimum(t0, t1).max()
            tmax = np.maximum(t0, t1).min()
            any_hit |= bool(tmax >= max(tmin, 0.0))
        survives.append(any_hit)
    assert survives[0] and survives[31] and sum(survives) == 2

    ref = intersect(geom, o, d, 1e-4, INF_D)
    got = intersect_clustered(geom, clusters, o, d, 1e-4, INF_D,
                              interpret=True)
    assert int(np.asarray(ref.valid).sum()) > 100
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.prim),
                                  np.asarray(ref.prim))


def test_sorted_dispatch_matches():
    """Ray sorting before the clustered kernel (ops/intersect.py
    _ray_sort_perm, BDPT_TPU_SORT) is purely a performance transform:
    unpermuting the sorted launch's results must reproduce the unsorted
    launch BITWISE, for any ray set (the kernel's per-ray closest hit and
    min-index tie rule are independent of tile grouping)."""
    from bidirectional_pathtracing_tpu.ops.intersect import _ray_sort_perm
    geom = _random_mesh(2000, seed=13)
    clusters = build_clusters(geom, paired=False)
    o, d = _random_rays(1024, seed=14)
    perm = _ray_sort_perm(clusters, o, d, jnp.full((1024,), 1e-4),
                          jnp.full((1024,), INF_D))
    # a valid permutation
    assert sorted(np.asarray(perm).tolist()) == list(range(1024))
    ref = intersect_clustered(geom, clusters, o, d, 1e-4, INF_D,
                              interpret=True)
    got = intersect_clustered(geom, clusters, o[perm], d[perm], 1e-4, INF_D,
                              interpret=True)
    inv = np.zeros(1024, np.int32)
    inv[np.asarray(perm)] = np.arange(1024, dtype=np.int32)
    np.testing.assert_array_equal(np.asarray(got.valid)[inv],
                                  np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.t)[inv],
                                  np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.prim)[inv],
                                  np.asarray(ref.prim))


def test_sorted_occlusion_matches():
    """The any-hit variant is permutation-invariant too: unpermuting a
    first-cluster-sorted launch reproduces the unsorted result bitwise
    (the production shadow-batch path, ops/intersect.py
    _sorted_clustered_occluded)."""
    from bidirectional_pathtracing_tpu.ops.intersect import (
        _ray_sort_perm, occluded)
    from bidirectional_pathtracing_tpu.ops.intersect_clustered import (
        occluded_clustered)
    geom = _random_mesh(1500, seed=15)
    clusters = build_clusters(geom, paired=False)
    o, d = _random_rays(1024, seed=16)
    # a mix of live windows and dead (pruned-pair) windows
    rng = np.random.default_rng(17)
    max_t = jnp.asarray(np.where(rng.random(1024) < 0.3, -1.0,
                                 rng.uniform(0.5, 6.0, 1024)).astype(
                                     np.float32))
    min_t = jnp.full((1024,), 1e-3)
    perm = _ray_sort_perm(clusters, o, d, min_t, max_t)
    ref = occluded_clustered(geom, clusters, o, d, min_t, max_t,
                             interpret=True)
    got = occluded_clustered(geom, clusters, o[perm], d[perm],
                             min_t[perm], max_t[perm], interpret=True)
    inv = np.zeros(1024, np.int32)
    inv[np.asarray(perm)] = np.arange(1024, dtype=np.int32)
    np.testing.assert_array_equal(np.asarray(got)[inv], np.asarray(ref))
    # and both agree with the brute-force oracle
    np.testing.assert_array_equal(
        np.asarray(ref), np.asarray(occluded(geom, o, d, min_t, max_t)))


def test_cluster_builder_covers_all_triangles():
    geom = _random_mesh(1000, seed=8)
    clusters = build_clusters(geom, paired=False)
    p2g = np.asarray(clusters.pad2global)
    real = p2g[p2g >= 0]
    assert sorted(real.tolist()) == list(range(1000))
    # every real triangle's vertices inside its cluster AABB
    cb = np.asarray(clusters.cluster_b)
    tris = np.asarray(clusters.tris)
    chunk = clusters.chunk
    for ci in range(clusters.n_clusters):
        k = p2g[ci * chunk:(ci + 1) * chunk] >= 0
        if not k.any():
            continue
        v = tris[ci][:9, k].reshape(3, 3, -1)  # [vtx, xyz, n]
        assert (v.min(axis=(0, 2)) >= cb[0:3, ci] - 1e-4).all()
        assert (v.max(axis=(0, 2)) <= cb[3:6, ci] + 1e-4).all()


def test_clustered_dense_mask_word():
    """Force a fully-dense survivor word (all 32 bits set, incl. bit 31 =
    INT_MIN) so the kernel's dense scan path and the two's-complement
    edge of the sparse bit walk are both pinned.  4096 tris in one tight
    cube -> 32 fully-overlapping clusters = one block, one full word."""
    geom = _random_mesh(4096, seed=21, extent=0.3)
    clusters = build_clusters(geom, paired=False)
    # spatial clustering over a tight cube: every cluster AABB overlaps
    # every ray's path, so survivor word 0 fills all 32 bits
    assert clusters.n_clusters >= 32 and clusters.n_blocks == 1
    # rays shot through the cube from outside: every cluster AABB passes
    # the slab test for every ray -> mask = 0xFFFFFFFF
    rng = np.random.default_rng(22)
    o = rng.uniform(-3, -2, (256, 3)).astype(np.float32)
    tgt = rng.uniform(-0.3, 0.3, (256, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = intersect(geom, o, d, 1e-4, INF_D)
    got = intersect_clustered(geom, clusters, o, d, 1e-4, INF_D,
                              interpret=True)
    assert int(np.asarray(ref.valid).sum()) > 200   # the word really fills
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.prim),
                                  np.asarray(ref.prim))


@pytest.mark.slow
def test_clustered_subtiles2_matches_bruteforce():
    """The experimental per-sub-tile MT mask path (BDPT_TPU_SUBTILES=2,
    kept for large-scene experiments; default 1) must stay bit-identical
    to the brute-force reference.  SUBTILES is read at import time, so
    the check runs in a subprocess with the env set."""
    import subprocess
    import sys
    snippet = (
        "import numpy as np, jax.numpy as jnp\n"
        "from tests.test_clustered import _random_mesh, _random_rays\n"
        "from bidirectional_pathtracing_tpu.ops.intersect import intersect\n"
        "from bidirectional_pathtracing_tpu.ops.intersect_clustered import ("
        "intersect_clustered, SUBTILES)\n"
        "from bidirectional_pathtracing_tpu.scene.clusters import "
        "build_clusters\n"
        "from bidirectional_pathtracing_tpu.core.math import INF_D\n"
        "assert SUBTILES == 2\n"
        "geom = _random_mesh(700, seed=3)\n"
        "o, d = _random_rays(640, seed=4)\n"
        "ref = intersect(geom, o, d, 1e-4, INF_D)\n"
        # SUBTILES masks the ray axis of the FLAT layout (paired +
        # SUBTILES>1 raises by design)
        "clusters = build_clusters(geom, paired=False)\n"
        "got = intersect_clustered(geom, clusters, o, d, 1e-4, INF_D,"
        " interpret=True)\n"
        "np.testing.assert_array_equal(np.asarray(got.valid),"
        " np.asarray(ref.valid))\n"
        "np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),"
        " rtol=1e-6)\n"
        "np.testing.assert_array_equal(np.asarray(got.prim),"
        " np.asarray(ref.prim))\n"
        "print('SUBTILES2_OK')\n"
    )
    env = dict(os.environ, BDPT_TPU_SUBTILES="2", JAX_PLATFORMS="cpu")
    p = subprocess.run([sys.executable, "-c", snippet], cwd=REPO,
                       capture_output=True, text=True, timeout=600, env=env)
    assert "SUBTILES2_OK" in p.stdout, (p.stdout[-500:], p.stderr[-1500:])
