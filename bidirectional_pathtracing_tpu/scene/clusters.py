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
# with a tpu.memref_slice diagnostic).  Finer-grained streaming is the
# PAIRED layout below (r03 VERDICT #4): 64-triangle BVH leaves packed two
# per 128-lane row, each with its own AABB, so the kernel can run
# Möller–Trumbore on a surviving half-row only.
CLUSTER_SIZE = 128
SUB_SIZE = 64        # triangles per sub-cluster in the paired layout
BLOCK_SIZE = 128     # cluster (or sub-cluster) bound rows per block

import os as _os

# Paired sub-cluster layout knob.  A/B measured on chip at 480x360 d5
# spp8 (artifacts/SUBCLUSTER_AB.json, r04): 28.5k tris +23%, 114k tris
# +15%, 457k tris -10% — tight tile unions leave one sub of most pairs
# dead (half the Möller–Trumbore per visit) while huge scenes' wide
# unions keep both subs alive and only pay the doubled per-block slab
# overhead.  "auto" (default) picks paired for scenes at or below
# PAIR_AUTO_MAX_TRIS; "1"/"0" force it on/off.
SUBCLUSTERS = _os.environ.get("BDPT_TPU_SUBCLUSTERS", "auto")
PAIR_AUTO_MAX_TRIS = 200_000

# Cluster-cut split rule (VERDICT r04 #1).  "midpoint" reproduces the
# reference's spatial-midpoint BVH split (bvh.cpp:51-129); "sah" uses the
# binned surface-area-heuristic builder (ops/native/bvh_builder.cpp
# bvh_build_sah) — lower-overlap leaf boxes mean a ray tile streams fewer
# clusters.  The split rule is NOT part of the reference contract (only
# closest-hit semantics are).  On-chip A/B (artifacts/CLUSTER_BUILD_AB
# .json, two warm quiet-host repetitions): SAH wins every production
# cell — CBbunny paired +3.6%, 114k-tri CBbunny_up1 paired +1.7..3.2%,
# 457k-tri CBlucy_standin flat +2.1..2.8% — matching the offline
# streamed-visit study (tools/profiling/cut_quality_study.py, -4..-6%
# visits), so "sah" is the default.  The per-visit compute floor, not
# the cut, bounds large-scene throughput (BENCH_NOTES.md).
CLUSTER_BUILD = _os.environ.get("BDPT_TPU_CLUSTER_BUILD", "sah")


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


class PairedClusteredTris(NamedTuple):
    """Paired sub-cluster layout (BDPT_TPU_SUBCLUSTERS=1).

    S sub-clusters of <= SUB_SIZE triangles (64-leaf BVH cut); pair p
    packs subs (2p, 2p+1) into one 128-lane HBM row so DMA stays
    lane-legal while Möller–Trumbore can run on a surviving half only.
    Block b covers pairs [64b, 64b+64); its 128 `cluster_b` bound rows are
    laid out A-half-first — row r < 64 is sub 2*(64b+r) ("A"), row
    r >= 64 is sub 2*(64b+r-64)+1 ("B") — so the kernel's per-word A/B
    bitmasks pack from CONTIGUOUS flag slices.
    """

    block_b: "jnp.ndarray"     # f32 [NBpad, 8]
    cluster_b: "jnp.ndarray"   # f32 [8, NB*128] sub-cluster bounds, A/B rows
    tris: "jnp.ndarray"        # f32 [P, 16, 128]: lanes 0:64 sub A, 64: sub B
    pad2global: "jnp.ndarray"  # int32 [P*128] global tri id or -1
    sub_marker: "jnp.ndarray"  # f32 [S, 0] zero-byte shape carrier: S = #subs

    @property
    def n_pairs(self) -> int:
        return self.tris.shape[0]

    @property
    def n_subs(self) -> int:
        return self.sub_marker.shape[0]

    @property
    def n_blocks(self) -> int:
        return -(-self.tris.shape[0] // (BLOCK_SIZE // 2))

    @property
    def chunk(self) -> int:
        return self.tris.shape[2]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _leaf_cut(geom, leaf_size: int, build: str | None = None):
    """Host-side BVH leaf cut: returns (leaves, bounds_lo, bounds_hi,
    prim_start, prim_count, gids) or None when no triangles.
    build: "midpoint" | "sah" (None follows BDPT_TPU_CLUSTER_BUILD)."""
    from bidirectional_pathtracing_tpu.scene import bvh as bvh_mod

    sah = (build or CLUSTER_BUILD) == "sah"
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
        nodes = bvh_build_native(lo, hi, leaf_size, sah=sah)
    except Exception:
        nodes = bvh_mod._build_numpy(lo, hi, leaf_size, sah=sah)
    (bounds_lo, bounds_hi, is_leaf, prim_start, prim_count, _escape,
     order) = nodes
    gids = ids[order]  # leaf-ordered global triangle ids
    leaves = np.where(is_leaf)[0]
    return leaves, bounds_lo, bounds_hi, prim_start, prim_count, gids, tri_p


def build_clusters(geom, cluster_size: int = CLUSTER_SIZE,
                   block_size: int = BLOCK_SIZE, paired: bool | None = None,
                   build: str | None = None):
    """Build the two-level cut (midpoint or SAH leaf cut, see _leaf_cut).

    Returns ClusteredTris / PairedClusteredTris, or None when the scene
    has no triangles.  paired=None follows BDPT_TPU_SUBCLUSTERS;
    build=None follows BDPT_TPU_CLUSTER_BUILD.
    """
    import jax.numpy as jnp

    if paired is None:
        if SUBCLUSTERS == "auto":
            n_valid = int(np.asarray(geom.tri_valid).sum())
            paired = n_valid <= PAIR_AUTO_MAX_TRIS
            from bidirectional_pathtracing_tpu.ops import (
                intersect_clustered as _ic)
            if paired and _ic.SUBTILES > 1:
                # the paired layout rejects SUBTILES>1 at dispatch; keep
                # the documented knob functional by falling back to flat
                import logging
                logging.getLogger(__name__).info(
                    "BDPT_TPU_SUBTILES=%d: auto cluster layout falls back "
                    "to flat (paired does not support sub-tile masks)",
                    _ic.SUBTILES)
                paired = False
        else:
            paired = SUBCLUSTERS != "0"
    if paired:
        return build_paired_clusters(geom, build=build)

    cut = _leaf_cut(geom, cluster_size, build)
    if cut is None:
        return None
    leaves, bounds_lo, bounds_hi, prim_start, prim_count, gids, tri_p = cut
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


def build_paired_clusters(geom, build: str | None = None):
    """Build the PAIRED sub-cluster layout: 64-leaf BVH cut, two subs per
    128-lane row, A/B bound-row split per block (see PairedClusteredTris).
    """
    import jax.numpy as jnp

    cut = _leaf_cut(geom, SUB_SIZE, build)
    if cut is None:
        return None
    leaves, bounds_lo, bounds_hi, prim_start, prim_count, gids, tri_p = cut
    s_count = len(leaves)
    p_count = -(-s_count // 2)
    n_blocks = max(-(-p_count // (BLOCK_SIZE // 2)), 1)

    tris = np.zeros((p_count, 16, CLUSTER_SIZE), np.float32)
    pad2global = np.full((p_count * CLUSTER_SIZE,), -1, np.int32)
    cb = np.zeros((8, n_blocks * BLOCK_SIZE), np.float32)
    cb[0:3, :] = np.inf           # padding rows: inverted AABB
    cb[3:6, :] = -np.inf
    for si, node in enumerate(leaves):
        p, half = si // 2, si % 2
        lane0 = half * SUB_SIZE
        s, n = int(prim_start[node]), int(prim_count[node])
        sel = gids[s:s + n]
        tris[p, :9, lane0:lane0 + n] = tri_p[sel].reshape(n, 9).T
        pad2global[p * CLUSTER_SIZE + lane0:
                   p * CLUSTER_SIZE + lane0 + n] = sel
        b, r = p // (BLOCK_SIZE // 2), p % (BLOCK_SIZE // 2)
        col = b * BLOCK_SIZE + r + half * (BLOCK_SIZE // 2)
        cb[0:3, col] = bounds_lo[node]
        cb[3:6, col] = bounds_hi[node]

    nb_pad = max(_ceil_to(n_blocks, 8), 8)
    bb = np.zeros((nb_pad, 8), np.float32)
    bb[:, 0:3] = np.inf
    bb[:, 3:6] = -np.inf
    for b in range(n_blocks):
        sl = slice(b * BLOCK_SIZE, (b + 1) * BLOCK_SIZE)
        fin = np.isfinite(cb[0, sl]) & (cb[0, sl] <= cb[3, sl])
        if fin.any():
            bb[b, 0:3] = cb[0:3, sl][:, fin].min(axis=1)
            bb[b, 3:6] = cb[3:6, sl][:, fin].max(axis=1)

    return PairedClusteredTris(
        block_b=jnp.asarray(bb),
        cluster_b=jnp.asarray(cb),
        tris=jnp.asarray(tris),
        pad2global=jnp.asarray(pad2global),
        sub_marker=jnp.zeros((s_count, 0), jnp.float32),
    )
