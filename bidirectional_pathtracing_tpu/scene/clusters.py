"""Two-level triangle clustering for the large-scene TPU kernel.

The reference makes large meshes tractable with a per-ray recursive BVH
(reference src/scene/bvh.cpp:51-129 build, :161-188 traversal).  Pointer
chasing is hostile to the TPU vector unit, so the TPU design replaces the
deep tree with a *shallow two-level cut built from the same BVH*:

  - the reference's midpoint-split BVH is built host-side with
    max_leaf_size = CLUSTER_SIZE; every leaf becomes a "cluster" of up to
    CLUSTER_SIZE triangles with a tight AABB,
  - clusters are packed contiguously (padding slots hold degenerate
    zero-triangles, which Möller–Trumbore can never hit),
  - consecutive clusters (spatially coherent in BVH pre-order) are grouped
    into lane-aligned BLOCKS of BLOCK_SIZE clusters with merged AABBs.

The Pallas kernel (ops/intersect_clustered.py) then streams ONLY the
clusters whose AABB a ray tile actually cuts: per block it slab-tests the
merged AABB (skipping BLOCK_SIZE*CLUSTER_SIZE triangles at once on a miss),
then slab-tests the block's member clusters in one vectorized
[BLOCK_SIZE, TILE] pass, packs the surviving clusters into bitmask scalars,
and DMAs each survivor's [9, CLUSTER_SIZE] vertex block from HBM into VMEM
for a fully vectorized intersection test.  Cost per ray is proportional to
the clusters its tile touches, not to the scene size — the BVH's role,
without divergence.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

# triangles per cluster (= DMA block lane dim).  Must stay a multiple of
# the 128-lane VMEM tile: Mosaic rejects HBM->VMEM DMA slices with a
# narrower lane extent (measured r03: CLUSTER_SIZE=64 fails to compile
# with a tpu.memref_slice diagnostic), so finer-grained streaming would
# need a packed two-subclusters-per-row layout, not a smaller chunk.
CLUSTER_SIZE = 128
BLOCK_SIZE = 128     # clusters per block (= cluster-bounds lane alignment)


class ClusteredTris(NamedTuple):
    """Device arrays for the two-level clustered intersection kernel."""

    block_b: "jnp.ndarray"    # f32 [NBpad, 8]: lo.xyz, hi.xyz, 2 pad lanes
    cluster_b: "jnp.ndarray"  # f32 [8, Cpad]:  rows lo.xyz, hi.xyz, 2 pad
    # v0/v1/v2 xyz in rows 0..8; rows 9..15 pad (DMA needs sublane extents
    # that are multiples of 8 — a [9, TC] copy faults the TPU)
    tris: "jnp.ndarray"       # f32 [C, 16, CLUSTER_SIZE]
    pad2global: "jnp.ndarray"  # int32 [C*CLUSTER_SIZE] global tri id or -1

    @property
    def n_clusters(self) -> int:
        return self.tris.shape[0]

    @property
    def n_blocks(self) -> int:
        return -(-self.tris.shape[0] // BLOCK_SIZE)

    @property
    def chunk(self) -> int:
        return self.tris.shape[2]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def build_clusters(geom, cluster_size: int = CLUSTER_SIZE,
                   block_size: int = BLOCK_SIZE):
    """Build the two-level cut from the reference BVH algorithm.

    Returns ClusteredTris or None when the scene has no triangles.
    """
    import jax.numpy as jnp
    from bidirectional_pathtracing_tpu.scene import bvh as bvh_mod

    # ONE device->host pull (f32 is exact: the stored data is f32); float64
    # copies of big meshes over a remote-TPU link dominated build time
    tri_p = np.asarray(geom.tri_p, np.float32)
    tv = np.asarray(geom.tri_valid)
    ids = np.arange(tri_p.shape[0], dtype=np.int32)[tv]
    if ids.size == 0:
        return None
    lo = tri_p[tv].min(axis=1).astype(np.float64)
    hi = tri_p[tv].max(axis=1).astype(np.float64)
    try:
        from bidirectional_pathtracing_tpu.ops.native import bvh_build_native
        nodes = bvh_build_native(lo, hi, cluster_size)
    except Exception:
        nodes = bvh_mod._build_numpy(lo, hi, cluster_size)
    (bounds_lo, bounds_hi, is_leaf, prim_start, prim_count, _escape,
     order) = nodes
    gids = ids[order]  # leaf-ordered global triangle ids

    leaves = np.where(is_leaf)[0]
    c_count = len(leaves)

    pad2global = np.full((c_count * cluster_size,), -1, np.int32)
    tris = np.zeros((c_count, 16, cluster_size), np.float32)
    c_pad = max(_ceil_to(c_count, block_size), block_size)
    cb = np.zeros((8, c_pad), np.float32)
    cb[0:3, :] = np.inf          # padding clusters: inverted AABB, never hit
    cb[3:6, :] = -np.inf
    for ci, node in enumerate(leaves):
        s, n = int(prim_start[node]), int(prim_count[node])
        sel = gids[s:s + n]
        pad2global[ci * cluster_size:ci * cluster_size + n] = sel
        tris[ci, :9, :n] = tri_p[sel].reshape(n, 9).T
        cb[0:3, ci] = bounds_lo[node]
        cb[3:6, ci] = bounds_hi[node]

    n_blocks = -(-c_count // block_size)
    nb_pad = max(_ceil_to(n_blocks, 8), 8)
    bb = np.zeros((nb_pad, 8), np.float32)
    bb[:, 0:3] = np.inf
    bb[:, 3:6] = -np.inf
    for b in range(n_blocks):
        s = b * block_size
        e = min(s + block_size, c_count)
        bb[b, 0:3] = cb[0:3, s:e].min(axis=1)
        bb[b, 3:6] = cb[3:6, s:e].max(axis=1)

    return ClusteredTris(
        block_b=jnp.asarray(bb),
        cluster_b=jnp.asarray(cb),
        tris=jnp.asarray(tris),
        pad2global=jnp.asarray(pad2global),
    )
