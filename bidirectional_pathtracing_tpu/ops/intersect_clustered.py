"""Pallas TPU kernel: two-level clustered ray-triangle closest hit.

The large-scene [KERNEL] path (SURVEY.md hard part #1), filling the role of
the reference's recursive BVH traversal (reference src/scene/bvh.cpp:161-188)
with a TPU-native design (see scene/clusters.py for the data layout):

  grid = ray tiles of TILE_R rays; per tile the kernel
    1. slab-tests the tile against each 128-cluster block's merged AABB
       (6 scalar reads + one [TILE_R] vector test); a miss skips
       BLOCK_SIZE * CLUSTER_SIZE = 16384 triangles at once,
    2. slab-tests a surviving block's member clusters in ONE vectorized
       [BLOCK_SIZE, TILE_R] pass against the running per-ray best_t (the
       frontier tightens as hits land), reduces to per-cluster any-ray
       flags, and packs them into uint32 bitmask scalars (Mosaic forbids
       dynamic lane indexing, so flags ride in scalar registers),
    3. for each set bit, DMAs that cluster's [9, CLUSTER_SIZE] vertex
       block from HBM into VMEM and runs Möller–Trumbore
       (triangle.cpp:57-95 semantics) for the whole tile at once, updating
       the per-ray closest hit with the min-over-iota reduction.

Triangles the kernel never streams never cost HBM bandwidth or FLOPs, so
per-ray cost scales with the clusters a tile touches (the BVH's log-ish
behavior) instead of with scene size, while every arithmetic op stays a
dense [CLUSTER_SIZE, TILE_R] VPU op — no pointer chasing, no divergence.

Closest-hit indices are exact for scenes up to 2^24 triangles (the index
rides in an f32 mantissa like ops/intersect_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bidirectional_pathtracing_tpu.core.math import INF_D
from bidirectional_pathtracing_tpu.ops.intersect import (
    Hit, sphere_intersect_batch, _ceil_to)
from bidirectional_pathtracing_tpu.scene.clusters import (
    ClusteredTris, PairedClusteredTris, BLOCK_SIZE)

# Rays per kernel tile.  Trade-off measured on CBbunny (BENCH_NOTES.md):
# coherent camera rays get faster with LARGER tiles (the beam touches a
# near-constant cluster set, so fewer tiles = less total streaming) while
# incoherent bounce rays get slower (a wide tile's rays collectively touch
# most clusters; 1024 was pathological).  256 won the full-render sweep
# (+15% BDPT samples/s over 512 on CBbunny); override for experiments.
import os as _os

TILE_R = int(_os.environ.get("BDPT_TPU_TILE_R", "256"))

# Survivor masks can be tracked per SUB-TILE of TILE_R // SUBTILES rays,
# running the streamed cluster's Möller–Trumbore only on sub-tiles that
# have a surviving ray (DMA/scalar cost stays per-tile; MT cost drops to
# the finer-grained unions).  Measured on CBbunny (28.5k tris): -9% —
# morton-sorted walk tiles are spatially tight enough that both halves
# stream nearly the same clusters, so the split only doubles op-issue
# (BENCH_NOTES.md "divergence experiments").  Default stays 1; the knob
# is kept for large-scene experiments where tile unions are far wider.
SUBTILES = int(_os.environ.get("BDPT_TPU_SUBTILES", "1"))
if SUBTILES < 1 or TILE_R % SUBTILES != 0:
    raise ValueError(
        f"BDPT_TPU_SUBTILES={SUBTILES} must be a positive divisor of "
        f"TILE_R={TILE_R}")


def _clustered_kernel(rays_ref, bb_ref, cb_ref, tris_hbm,
                      t_ref, idx_ref,
                      bt_ref, bi_ref, tri_scr, sems,
                      *, n_blocks, block_size, n_clusters, tc,
                      any_hit=False, paired=False, n_subs=0):
    o = [rays_ref[i, :] for i in range(3)]          # [TILE_R]
    d = [rays_ref[3 + i, :] for i in range(3)]
    min_t = rays_ref[6, :]
    max_t = rays_ref[7, :]
    inv_d = [jnp.where(d[k] == 0, INF_D,
                       1.0 / jnp.where(d[k] == 0, 1.0, d[k]))
             for k in range(3)]

    bt_ref[0, :] = jnp.full((TILE_R,), INF_D, jnp.float32)
    bi_ref[0, :] = jnp.full((TILE_R,), -1.0, jnp.float32)

    hw = TILE_R // SUBTILES                         # rays per sub-tile
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (tc, hw), 0).astype(jnp.float32)
    # bit masks ride in int32 (Mosaic lacks unsigned reductions); bit 31 is
    # INT_MIN, which sums and logical-shifts exactly like the uint bit
    pow2 = jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0))
    srl = jax.lax.shift_right_logical

    def mt_half(c, vc, e1, e2, h, io=None):
        """Möller–Trumbore one streamed cluster against sub-tile h.
        vc/e1/e2 are the cluster's [n, 1] columns (shared prep); io the
        matching absolute-row iota (defaults to the full-cluster one)."""
        io = iota if io is None else io
        sl = slice(h * hw, (h + 1) * hw)
        oh = [ok[sl] for ok in o]
        dh = [dk[sl] for dk in d]
        mn = min_t[sl]
        mx = max_t[sl]
        s = [oh[k][None, :] - vc[k] for k in range(3)]
        s1 = [dh[(k + 1) % 3][None, :] * e2[(k + 2) % 3]
              - dh[(k + 2) % 3][None, :] * e2[(k + 1) % 3]
              for k in range(3)]
        s2 = [s[(k + 1) % 3] * e1[(k + 2) % 3]
              - s[(k + 2) % 3] * e1[(k + 1) % 3]
              for k in range(3)]
        denom = sum(s1[k] * e1[k] for k in range(3))
        inv = jnp.where(denom == 0, 0.0,
                        1.0 / jnp.where(denom == 0, 1.0, denom))
        t = sum(s2[k] * e2[k] for k in range(3)) * inv
        b1 = sum(s1[k] * s[k] for k in range(3)) * inv
        b2 = sum(s2[k] * dh[k][None, :] for k in range(3)) * inv
        best_t = bt_ref[0, sl]
        ok = ((denom != 0) & (t >= mn[None, :])
              & (t <= jnp.minimum(mx, best_t)[None, :])
              & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1))
        tm = jnp.where(ok, t, INF_D)
        cmin = jnp.min(tm, axis=0)                   # [hw]
        hit_iota = jnp.where(tm <= cmin[None, :],
                             io + (c * tc).astype(jnp.float32), INF_D)
        cidx = jnp.min(hit_iota, axis=0)
        closer = cmin < best_t
        bi_ref[0, sl] = jnp.where(closer, cidx, bi_ref[0, sl])
        if any_hit:
            # occlusion semantics: a hit ray needs no closest point — poison
            # its window so every later slab test fails and its blocks are
            # skipped (the reference's early-out any-hit, bvh.cpp:131-158,
            # without its leaf-miss fallthrough bug)
            bt_ref[0, sl] = jnp.where(closer, -INF_D, best_t)
        else:
            bt_ref[0, sl] = jnp.where(closer, cmin, best_t)

    def mt_cluster(c, slot, cl, sub_masks, lane_lo=0, lane_n=None):
        """Shared per-cluster prep, then MT only on sub-tiles whose
        survivor bit for cluster-bit cl is set (all sub-tiles when
        SUBTILES == 1: the caller only reaches set any-bits).

        (lane_lo, lane_n): paired layout's static half-row window — MT
        runs on the surviving sub-cluster's triangles only.  The window
        is applied AFTER the full-row load, as a sublane slice of the
        [tc, 1] value (Mosaic rejects sub-128-lane ref slices — the r04
        paired-kernel compile crash — but value sublane slices at
        8-multiple offsets are legal)."""
        n = tc if lane_n is None else lane_n
        v = [tri_scr[slot, k, :] for k in range(9)]  # [tc] full row
        vc = [vk[:, None][lane_lo:lane_lo + n] for vk in v]   # [n, 1]
        e1 = [vc[3 + k] - vc[k] for k in range(3)]
        e2 = [vc[6 + k] - vc[k] for k in range(3)]
        if lane_n is None:
            io = iota
        else:
            # generate the window's absolute-row iota directly: SLICING a
            # broadcasted_iota value crashes the Mosaic compiler (r04
            # micro-repro: array.h Check failed limits[i] <= dim(i))
            io = (jax.lax.broadcasted_iota(jnp.int32, (n, hw), 0)
                  + lane_lo).astype(jnp.float32)
        if SUBTILES == 1:
            mt_half(c, vc, e1, e2, 0, io)
            return
        for h in range(SUBTILES):
            @pl.when((srl(sub_masks[h], cl) & 1) != 0)
            def _mt_h(h=h):
                mt_half(c, vc, e1, e2, h, io)

    def block_body(b, _):
        # level 1: merged block AABB, 6 scalar reads + one vector slab
        limit0 = jnp.minimum(max_t, bt_ref[0, :])
        tmin_b = jnp.full((TILE_R,), -INF_D, jnp.float32)
        tmax_b = jnp.full((TILE_R,), INF_D, jnp.float32)
        for k in range(3):
            a = (bb_ref[b, k] - o[k]) * inv_d[k]
            bq = (bb_ref[b, 3 + k] - o[k]) * inv_d[k]
            tmin_b = jnp.maximum(tmin_b, jnp.minimum(a, bq))
            tmax_b = jnp.minimum(tmax_b, jnp.maximum(a, bq))
        bhit = (tmax_b >= tmin_b) & (tmax_b >= min_t) & (tmin_b <= limit0)

        @pl.when(jnp.any(bhit))
        def _scan_block():
            # level 2: all member clusters in one vectorized slab pass
            base = b * block_size
            col = pl.ds(pl.multiple_of(base, 128), block_size)
            limit = jnp.minimum(max_t, bt_ref[0, :])
            tmin = jnp.full((block_size, TILE_R), -INF_D, jnp.float32)
            tmax = jnp.full((block_size, TILE_R), INF_D, jnp.float32)
            for k in range(3):
                lo_k = cb_ref[k, col]                # [block_size]
                hi_k = cb_ref[3 + k, col]
                a = (lo_k[:, None] - o[k][None, :]) * inv_d[k][None, :]
                bq = (hi_k[:, None] - o[k][None, :]) * inv_d[k][None, :]
                tmin = jnp.maximum(tmin, jnp.minimum(a, bq))
                tmax = jnp.minimum(tmax, jnp.maximum(a, bq))
            chit = ((tmax >= tmin) & (tmax >= min_t[None, :])
                    & (tmin <= limit[None, :]))
            # never stream padding slots past the real cluster count (their
            # +/-inf sentinel bounds pass the slab test; a DMA would read
            # out of bounds).  Paired layout: row r < 64 is sub-cluster
            # 2*(64b+r) ("A"), row r >= 64 is 2*(64b+r-64)+1 ("B").
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (block_size, 1), 0)
            if paired:
                hb = block_size // 2
                base_pair = b * hb
                sub_id = jnp.where(
                    row_ids < hb, 2 * (base_pair + row_ids),
                    2 * (base_pair + row_ids - hb) + 1)
                valid = sub_id < n_subs
            else:
                valid = (row_ids + base) < n_clusters
            sub_flags = [jnp.any(chit[:, h * hw:(h + 1) * hw], axis=1,
                                 keepdims=True) & valid
                         for h in range(SUBTILES)]
            flags = sub_flags[0]
            for sf in sub_flags[1:]:
                flags = flags | sf

            # Lowest set bit (m & -m is an exact power of two;
            # bit 31 = INT_MIN survives the two's-complement round
            # trip) -> index via 5 integer mask tests (Mosaic has
            # no scalar bitcast, so no f32-exponent trick).
            def bit_index(m):
                low = m & -m
                idx = jnp.int32(0)
                for step, cmask in ((16, -65536),        # 0xFFFF0000
                                    (8, -16711936),      # 0xFF00FF00
                                    (4, -252645136),     # 0xF0F0F0F0
                                    (2, -858993460),     # 0xCCCCCCCC
                                    (1, -1431655766)):   # 0xAAAAAAAA
                    idx += jnp.where(
                        (low & jnp.int32(cmask)) != 0, step, 0)
                return idx

            def scan_word(mask, row_base, mt_fn):
                """Stream + MT every set bit of `mask`.  ALL surviving
                DMAs are issued before the first wait (32 scratch slots,
                per-slot semaphores), so HBM latency hides behind the
                Möller–Trumbore of earlier slots.

                Sparse masks (coherent camera tiles survive only a
                handful of clusters) iterate set bits only — 2.8x on
                CBbunny primaries vs scanning all 32 slots.  Dense masks
                (incoherent bounce tiles) keep the fixed scan: per-bit
                index extraction costs more than it saves once most slots
                are live.  popcount picks the path."""
                def dma(cl):
                    return pltpu.make_async_copy(
                        tris_hbm.at[row_base + cl],
                        tri_scr.at[cl], sems.at[cl])

                m32 = mask
                m32 = m32 - (srl(m32, 1) & jnp.int32(0x55555555))
                m32 = ((m32 & jnp.int32(0x33333333))
                       + (srl(m32, 2) & jnp.int32(0x33333333)))
                m32 = (m32 + srl(m32, 4)) & jnp.int32(0x0F0F0F0F)
                pc = srl(m32 * jnp.int32(0x01010101), 24)

                @pl.when(pc <= jnp.int32(12))
                def _sparse():
                    def start_body(m):
                        dma(bit_index(m)).start()
                        return m & (m - 1)

                    def mt_body(m):
                        cl = bit_index(m)
                        dma(cl).wait()
                        mt_fn(cl)
                        return m & (m - 1)

                    nz = lambda m: m != jnp.int32(0)
                    jax.lax.while_loop(nz, start_body, mask)
                    jax.lax.while_loop(nz, mt_body, mask)

                @pl.when(pc > jnp.int32(12))
                def _dense():
                    def start_body(cl, __):
                        @pl.when((srl(mask, cl) & 1) != 0)
                        def _start():
                            dma(cl).start()
                        return __

                    def mt_body(cl, __):
                        @pl.when((srl(mask, cl) & 1) != 0)
                        def _mt():
                            dma(cl).wait()
                            mt_fn(cl)
                        return __

                    jax.lax.fori_loop(0, 32, start_body, 0)
                    jax.lax.fori_loop(0, 32, mt_body, 0)

            if paired:
                # level 3, paired: words of 32 PAIRS; a pair streams as one
                # 128-lane DMA row, but MT runs only on surviving halves
                hb = block_size // 2
                base_pair = b * hb
                for w in range(hb // 32):
                    fa = flags[w * 32:(w + 1) * 32]
                    fb = flags[hb + w * 32:hb + (w + 1) * 32]
                    maskA = jnp.sum(jnp.where(fa, pow2, jnp.int32(0)))
                    maskB = jnp.sum(jnp.where(fb, pow2, jnp.int32(0)))
                    mask = maskA | maskB

                    @pl.when(mask != jnp.int32(0))
                    def _scan_word_p(maskA=maskA, maskB=maskB, mask=mask,
                                     w=w):
                        def mt_pair(cl):
                            c = base_pair + w * 32 + cl
                            a_on = (srl(maskA, cl) & 1) != 0
                            b_on = (srl(maskB, cl) & 1) != 0

                            @pl.when(a_on & b_on)
                            def _full():
                                mt_cluster(c, cl, cl, None)

                            @pl.when(a_on & ~b_on)
                            def _half_a():
                                mt_cluster(c, cl, cl, None, 0, tc // 2)

                            @pl.when(b_on & ~a_on)
                            def _half_b():
                                mt_cluster(c, cl, cl, None, tc // 2,
                                           tc // 2)

                        scan_word(mask, base_pair + w * 32, mt_pair)
            else:
                # level 3: stream surviving clusters (bits in scalars)
                for w in range(block_size // 32):
                    fw = flags[w * 32:(w + 1) * 32]
                    mask = jnp.sum(jnp.where(fw, pow2, jnp.int32(0)))
                    sub_masks = [
                        jnp.sum(jnp.where(sf[w * 32:(w + 1) * 32],
                                          pow2, jnp.int32(0)))
                        for sf in sub_flags] if SUBTILES > 1 else None

                    @pl.when(mask != jnp.int32(0))
                    def _scan_word(mask=mask, w=w, sub_masks=sub_masks):
                        def mt_one(cl):
                            mt_cluster(base + w * 32 + cl, cl, cl,
                                       sub_masks)

                        scan_word(mask, base + w * 32, mt_one)

        return _

    jax.lax.fori_loop(0, n_blocks, block_body, 0)
    t_ref[0, :] = bt_ref[0, :]
    idx_ref[0, :] = bi_ref[0, :]


@functools.partial(jax.jit, static_argnames=("interpret", "any_hit"))
def tri_closest_hit_clustered(clusters: ClusteredTris, o, d, min_t, max_t,
                              interpret=False, any_hit=False):
    """Returns (t [R], padded-slot index f32 [R], -1 on miss).

    any_hit=True: t is meaningless (windows are poisoned on first hit);
    only idx >= 0 (hit anywhere in [min_t, max_t]) is defined."""
    r = o.shape[0]
    rp = _ceil_to(r, TILE_R)

    def pad(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((rp - r,) + a.shape[1:], fill, a.dtype)])

    rays = jnp.stack([
        pad(o[:, 0]), pad(o[:, 1]), pad(o[:, 2]),
        pad(d[:, 0]), pad(d[:, 1]), pad(d[:, 2], 1.0),
        pad(jnp.broadcast_to(min_t, (r,))),
        pad(jnp.broadcast_to(max_t, (r,)), -1.0),
    ])  # [8, rp]

    tc = clusters.chunk
    paired = isinstance(clusters, PairedClusteredTris)
    if paired and SUBTILES > 1:
        raise ValueError("BDPT_TPU_SUBTILES>1 is not supported with the "
                         "paired sub-cluster layout (BDPT_TPU_SUBCLUSTERS)")
    kernel = functools.partial(
        _clustered_kernel,
        n_blocks=clusters.n_blocks, block_size=BLOCK_SIZE,
        n_clusters=0 if paired else clusters.n_clusters,
        tc=tc, any_hit=any_hit, paired=paired,
        n_subs=clusters.n_subs if paired else 0)

    t, idx = pl.pallas_call(
        kernel,
        grid=(rp // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((clusters.block_b.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, clusters.cluster_b.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # tris stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, TILE_R), jnp.float32),   # best_t
            pltpu.VMEM((1, TILE_R), jnp.float32),   # best_i
            pltpu.VMEM((32, 16, tc), jnp.float32),  # streamed cluster slots
            pltpu.SemaphoreType.DMA((32,)),
        ],
        interpret=interpret,
    )(rays, clusters.block_b, clusters.cluster_b, clusters.tris)
    return t[0, :r], idx[0, :r]


def intersect_clustered(geom, clusters: ClusteredTris, o, d, min_t, max_t,
                        interpret=False) -> Hit:
    """Closest-hit via the clustered kernel + jnp spheres (merged after)."""
    r = o.shape[0]
    min_b = jnp.broadcast_to(jnp.asarray(min_t, o.dtype), (r,))
    max_b = jnp.broadcast_to(jnp.asarray(max_t, o.dtype), (r,))
    t, slot = tri_closest_hit_clustered(clusters, o, d, min_b, max_b,
                                        interpret=interpret)
    return resolve_clustered_hit(geom, clusters, o, d, min_b, max_b, t, slot)


def resolve_clustered_hit(geom, clusters: ClusteredTris, o, d,
                          min_b, max_b, t, slot) -> Hit:
    """Turn the kernel's (t, padded slot) into a full Hit: barycentric
    normal recompute for the winning triangle + jnp sphere merge.  Split
    out so the sorted dispatch (ops/intersect.py) can run the kernel on
    permuted rays, un-permute only (t, slot), and resolve in lane order."""
    r = o.shape[0]
    sid = jnp.clip(slot.astype(jnp.int32), 0,
                   clusters.pad2global.shape[0] - 1)
    tid = jnp.clip(clusters.pad2global[sid], 0, geom.num_tris - 1)
    tri_hit = (slot >= 0) & (t < INF_D)

    # recompute barycentrics/normal for the winning triangle only
    tp = geom.tri_p[tid]
    e1 = tp[:, 1] - tp[:, 0]
    e2 = tp[:, 2] - tp[:, 0]
    sv = o - tp[:, 0]
    s1 = jnp.cross(d, e2)
    s2 = jnp.cross(sv, e1)
    den = jnp.sum(s1 * e1, axis=-1)
    inv = jnp.where(den == 0, 0.0, 1.0 / jnp.where(den == 0, 1.0, den))
    b1 = jnp.sum(s1 * sv, axis=-1) * inv
    b2 = jnp.sum(s2 * d, axis=-1) * inv
    tn = geom.tri_n[tid]
    n_tri = (tn[:, 0] * (1 - b1 - b2)[:, None] + tn[:, 1] * b1[:, None]
             + tn[:, 2] * b2[:, None])
    n_tri = n_tri / jnp.maximum(
        jnp.linalg.norm(n_tri, axis=-1, keepdims=True), 1e-20)

    best_t = jnp.where(tri_hit, t, INF_D)
    best_n = jnp.where(tri_hit[:, None], n_tri, 0.0)
    best_mat = jnp.where(tri_hit, geom.tri_mat[tid], -1)
    best_prim = jnp.where(tri_hit, tid, -1)

    if geom.num_spheres > 0:
        from bidirectional_pathtracing_tpu.ops.intersect import sphere_merge
        best_t, best_n, best_mat, best_prim = sphere_merge(
            geom, o, d, min_b, max_b, best_t, best_n, best_mat, best_prim,
            jnp.int32(geom.num_tris))
    return Hit(t=best_t, valid=best_t < INF_D, n=best_n, mat=best_mat,
               prim=best_prim)


def occluded_clustered(geom, clusters: ClusteredTris, o, d, min_t, max_t,
                       interpret=False):
    """Any-hit [R] via the early-exit kernel variant + jnp spheres."""
    r = o.shape[0]
    min_b = jnp.broadcast_to(jnp.asarray(min_t, o.dtype), (r,))
    max_b = jnp.broadcast_to(jnp.asarray(max_t, o.dtype), (r,))
    _, slot = tri_closest_hit_clustered(clusters, o, d, min_b, max_b,
                                        interpret=interpret, any_hit=True)
    hit = slot >= 0
    if geom.num_spheres > 0:
        ts, hs = sphere_intersect_batch(
            o, d, geom.sph_c, geom.sph_r, min_b, max_b)
        hit = hit | jnp.any(hs & geom.sph_valid[None, :], axis=-1)
    return hit
