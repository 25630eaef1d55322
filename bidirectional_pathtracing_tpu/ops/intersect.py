"""Ray-scene intersection (closest hit + any hit / shadow rays).

Numerical semantics match the reference primitives exactly:
  - Möller–Trumbore triangles with barycentric-interpolated smooth normals
    (reference src/scene/triangle.cpp:57-95)
  - quadratic ray-sphere with nearer-root preference and analytic normals
    (reference src/scene/sphere.cpp:11-93)
  - closest-hit via global min over primitives, equivalent to the
    reference's mutable ray.max_t shrinking (bvh.cpp:161-188)
  - segment any-hit semantics for shadow rays ([min_t, max_t] clipping,
    bidirection.cpp:423-430)

The wavefront design replaces per-ray BVH recursion with batched primitive
streams: rays are a [R] wavefront; primitives are scanned in fixed-size
chunks via lax.scan so peak memory stays [R, CHUNK].  For the shipped
Cornell-box scenes (12-30k triangles) this is the fast path on TPU — fully
regular, no divergence, VPU-saturating.  A BVH path (scene/bvh.py +
ops.bvh_traverse) covers large meshes.

Hits are treated as non-differentiable (stop_gradient at the call sites):
gradients w.r.t. materials/emission flow through the shading algebra only.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bidirectional_pathtracing_tpu.core.math import EPS_F, INF_D
from bidirectional_pathtracing_tpu.scene.types import Geometry

_TRI_CHUNK = 512
_SPH_CHUNK = 128


class Hit(NamedTuple):
    t: jnp.ndarray        # f32 [R]  (INF_D when miss)
    valid: jnp.ndarray    # bool [R]
    n: jnp.ndarray        # f32 [R,3] shading normal (unnormalised ok? no: unit)
    mat: jnp.ndarray      # int32 [R] material id (-1 on miss)
    prim: jnp.ndarray     # int32 [R] global prim id (-1 on miss)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_axis0(a: jnp.ndarray, n: int):
    pad = n - a.shape[0]
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)


def tri_intersect_batch(o, d, p0, p1, p2, min_t, max_t):
    """Möller–Trumbore for a [R] ray wavefront against [T] triangles.

    Returns (t[R,T], b1[R,T], b2[R,T], hit[R,T]).  o,d: [R,3]; p*: [T,3];
    min_t/max_t: [R].
    """
    e1 = p1 - p0                      # [T,3]
    e2 = p2 - p0
    s = o[:, None, :] - p0[None]      # [R,T,3]
    s1 = jnp.cross(d[:, None, :], e2[None])        # [R,T,3]
    s2 = jnp.cross(s, e1[None])                    # [R,T,3]
    denom = jnp.sum(s1 * e1[None], axis=-1)        # [R,T]
    inv = jnp.where(denom == 0, 0.0, 1.0 / jnp.where(denom == 0, 1.0, denom))
    t = jnp.sum(s2 * e2[None], axis=-1) * inv
    b1 = jnp.sum(s1 * s, axis=-1) * inv
    b2 = jnp.sum(s2 * d[:, None, :], axis=-1) * inv
    hit = ((denom != 0) & (t >= min_t[:, None]) & (t <= max_t[:, None])
           & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1))
    return t, b1, b2, hit


def sphere_intersect_batch(o, d, c, r, min_t, max_t):
    """Quadratic sphere test (sphere.cpp:11-57) for [R] rays x [Q] spheres.

    Returns (t[R,Q], hit[R,Q]) taking the nearer in-range root.
    """
    oc = o[:, None, :] - c[None]                   # [R,Q,3]
    a = jnp.sum(d * d, axis=-1)[:, None]           # [R,1]
    b = 2.0 * jnp.sum(oc * d[:, None, :], axis=-1)  # [R,Q]
    cc = jnp.sum(oc * oc, axis=-1) - (r * r)[None]
    delta = b * b - 4.0 * a * cc
    ok = delta >= 0
    sq = jnp.sqrt(jnp.maximum(delta, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    t1_in = (t1 >= min_t[:, None]) & (t1 <= max_t[:, None])
    t2_in = (t2 >= min_t[:, None]) & (t2 <= max_t[:, None])
    t = jnp.where(t1_in, t1, t2)
    hit = ok & (t1_in | t2_in)
    return t, hit


def sphere_merge(geom, o, d, min_b, max_b,
                 best_t, best_n, best_mat, best_prim, prim_base):
    """Merge sphere hits into the running best hit.

    The winning sphere's attributes come from STATIC per-column selects
    over the (tiny) sphere table instead of `ts[rows, argmin]` row
    gathers: one such gather measured 33% of the entire CBspheres BDPT
    step on chip (r04 trace, fusion.3353 — TPU gathers run ~0.35G
    rows/s; these selects fuse into the surrounding elementwise work).
    Tie-breaking matches argmin (lowest sphere index wins).
    """
    ns = geom.sph_c.shape[0]
    ts, hs = sphere_intersect_batch(
        o, d, geom.sph_c, geom.sph_r, min_b, jnp.minimum(max_b, best_t))
    hs = hs & geom.sph_valid[None, :]
    ts = jnp.where(hs, ts, INF_D)
    tj = jnp.min(ts, axis=-1)
    r = o.shape[0]
    sc = jnp.zeros((r, 3), o.dtype)
    smat = jnp.zeros((r,), jnp.int32)
    sidx = jnp.zeros((r,), jnp.int32)
    for k in range(ns - 1, -1, -1):
        w = ts[:, k] <= tj
        sc = jnp.where(w[:, None], geom.sph_c[k], sc)
        smat = jnp.where(w, geom.sph_mat[k], smat)
        sidx = jnp.where(w, jnp.int32(k), sidx)
    closer = tj < best_t
    p_hit = o + tj[:, None] * d
    nrm = p_hit - sc
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    return (jnp.where(closer, tj, best_t),
            jnp.where(closer[:, None], nrm, best_n),
            jnp.where(closer, smat, best_mat),
            jnp.where(closer, prim_base + sidx, best_prim))


def intersect(geom: Geometry, o, d, min_t, max_t) -> Hit:
    """Closest-hit over all primitives.  o,d: [R,3]; min_t,max_t: [R] or scalar."""
    r_count = o.shape[0]
    min_t = jnp.broadcast_to(jnp.asarray(min_t, o.dtype), (r_count,))
    max_t = jnp.broadcast_to(jnp.asarray(max_t, o.dtype), (r_count,))

    best_t = jnp.full((r_count,), INF_D, o.dtype)
    best_n = jnp.zeros((r_count, 3), o.dtype)
    best_mat = jnp.full((r_count,), -1, jnp.int32)
    best_prim = jnp.full((r_count,), -1, jnp.int32)

    num_t = geom.num_tris
    tc = min(_TRI_CHUNK, _ceil_to(max(num_t, 1), 8))
    tp = _ceil_to(num_t, tc)
    tri_p = _pad_axis0(geom.tri_p, tp).reshape(tp // tc, tc, 3, 3)
    tri_n = _pad_axis0(geom.tri_n, tp).reshape(tp // tc, tc, 3, 3)
    tri_mat = _pad_axis0(geom.tri_mat, tp).reshape(tp // tc, tc)
    tri_valid = _pad_axis0(geom.tri_valid, tp).reshape(tp // tc, tc)
    tri_base = jnp.arange(tp, dtype=jnp.int32).reshape(tp // tc, tc)

    def tri_step(carry, chunk):
        bt, bn, bm, bp = carry
        cp, cn, cm, cv, cid = chunk
        t, b1, b2, hit = tri_intersect_batch(
            o, d, cp[:, 0], cp[:, 1], cp[:, 2], min_t, jnp.minimum(max_t, bt))
        hit = hit & cv[None, :]
        t = jnp.where(hit, t, INF_D)
        j = jnp.argmin(t, axis=-1)                   # [R]
        rows = jnp.arange(r_count)
        tj = t[rows, j]
        closer = tj < bt
        b1j = b1[rows, j][:, None]
        b2j = b2[rows, j][:, None]
        nj = (cn[j, 0] * (1.0 - b1j - b2j) + cn[j, 1] * b1j + cn[j, 2] * b2j)
        nj = nj / jnp.maximum(
            jnp.linalg.norm(nj, axis=-1, keepdims=True), 1e-20)
        bt = jnp.where(closer, tj, bt)
        bn = jnp.where(closer[:, None], nj, bn)
        bm = jnp.where(closer, cm[j], bm)
        bp = jnp.where(closer, cid[j], bp)
        return (bt, bn, bm, bp), None

    if num_t > 0:
        (best_t, best_n, best_mat, best_prim), _ = jax.lax.scan(
            tri_step, (best_t, best_n, best_mat, best_prim),
            (tri_p, tri_n, tri_mat, tri_valid, tri_base))

    # spheres (few; single batch of static selects)
    num_q = geom.num_spheres
    if num_q > 0:
        best_t, best_n, best_mat, best_prim = sphere_merge(
            geom, o, d, min_t, max_t, best_t, best_n, best_mat, best_prim,
            jnp.int32(num_t))

    valid = best_t < INF_D
    return Hit(t=best_t, valid=valid, n=best_n, mat=best_mat, prim=best_prim)


def occluded(geom: Geometry, o, d, min_t, max_t) -> jnp.ndarray:
    """Any-hit [R] for shadow segments (visibility test).

    Mirrors the reference's use of bvh->intersect on a [EPS, dist-EPS]
    segment (bidirection.cpp:418-433); implemented without the reference's
    leaf-miss traversal bug (bvh.cpp:142-157), which the reference never
    exercises for shadow rays because it calls the closest-hit path.
    """
    r_count = o.shape[0]
    min_t = jnp.broadcast_to(jnp.asarray(min_t, o.dtype), (r_count,))
    max_t = jnp.broadcast_to(jnp.asarray(max_t, o.dtype), (r_count,))
    hit_any = jnp.zeros((r_count,), bool)

    num_t = geom.num_tris
    if num_t > 0:
        tc = min(_TRI_CHUNK, _ceil_to(max(num_t, 1), 8))
        tp = _ceil_to(num_t, tc)
        tri_p = _pad_axis0(geom.tri_p, tp).reshape(tp // tc, tc, 3, 3)
        tri_valid = _pad_axis0(geom.tri_valid, tp).reshape(tp // tc, tc)

        def step(carry, chunk):
            cp, cv = chunk
            _, _, _, hit = tri_intersect_batch(
                o, d, cp[:, 0], cp[:, 1], cp[:, 2], min_t, max_t)
            return carry | jnp.any(hit & cv[None, :], axis=-1), None

        hit_any, _ = jax.lax.scan(step, hit_any, (tri_p, tri_valid))

    if geom.num_spheres > 0:
        _, hit = sphere_intersect_batch(
            o, d, geom.sph_c, geom.sph_r, min_t, max_t)
        hit_any = hit_any | jnp.any(hit & geom.sph_valid[None, :], axis=-1)
    return hit_any


def occluded_segment(geom: Geometry, a, b, rel_eps: float = 2e-4):
    """Visibility test between points a and b [R,3].

    The reference clips shadow segments to [EPS, dist - EPS] in double
    precision (bidirection.cpp:423-430), where the endpoint's own primitive
    falls outside max_t exactly.  In float32 the sphere quadratic's
    cancellation error (~1e-5 * dist) exceeds the absolute epsilon and
    falsely self-occludes endpoints lying ON a sphere, so we clip the far
    end by a RELATIVE margin instead.  Returns (blocked[R], dir[R,3],
    dist[R]).
    """
    d = b - a
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-20))
    conn = d / dist[..., None]
    max_t = dist * (1.0 - rel_eps) - EPS_F
    blocked = occluded(geom, a, conn, EPS_F, max_t)
    return blocked, conn, dist


# --- BVH traversal (flattened pre-order, escape links) ----------------------

def _bvh_slab(o, inv_d, lo, hi, min_t, max_t):
    """Slab test (bbox.cpp:10-56) vectorized; returns hit mask."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tmax >= tmin) & (tmax >= min_t) & (tmin <= max_t)


def _leaf_prims(geom, bvh, start, count, leaf_size):
    """Gather up to leaf_size global prim ids for a leaf; -1 padded."""
    slots = []
    for j in range(leaf_size):
        pid = bvh.prim_order[jnp.clip(start + j, 0, bvh.prim_order.shape[0] - 1)]
        slots.append(jnp.where(j < count, pid, -1))
    return slots


def intersect_bvh(geom: Geometry, bvh, o, d, min_t, max_t,
                  leaf_size: int = 4, any_hit: bool = False):
    """Closest-hit (or any-hit) via stackless pre-order traversal.

    Each ray walks the linearised tree with an escape-link pointer
    (bvh.cpp:161-188 semantics, without recursion); rays advance in
    lockstep inside a lax.while_loop until all reach the end sentinel.
    """
    r_count = o.shape[0]
    n_nodes = bvh.is_leaf.shape[0]
    num_t = geom.num_tris
    min_t = jnp.broadcast_to(jnp.asarray(min_t, o.dtype), (r_count,))
    max_t = jnp.broadcast_to(jnp.asarray(max_t, o.dtype), (r_count,))
    inv_d = jnp.where(d == 0, INF_D, 1.0 / jnp.where(d == 0, 1.0, d))

    def test_prim(pid, best_t):
        """Unified tri/sphere test for global prim id [R]. Returns
        (t, n, mat) with t=INF on miss."""
        is_tri = (pid >= 0) & (pid < num_t)
        tid = jnp.clip(pid, 0, num_t - 1)
        tp = geom.tri_p[tid]
        e1 = tp[:, 1] - tp[:, 0]
        e2 = tp[:, 2] - tp[:, 0]
        sv = o - tp[:, 0]
        s1 = jnp.cross(d, e2)
        s2 = jnp.cross(sv, e1)
        den = jnp.sum(s1 * e1, axis=-1)
        inv = jnp.where(den == 0, 0.0, 1.0 / jnp.where(den == 0, 1.0, den))
        t_tri = jnp.sum(s2 * e2, axis=-1) * inv
        b1 = jnp.sum(s1 * sv, axis=-1) * inv
        b2 = jnp.sum(s2 * d, axis=-1) * inv
        tri_ok = (is_tri & (den != 0) & (t_tri >= min_t)
                  & (t_tri <= jnp.minimum(max_t, best_t))
                  & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1))
        tn = geom.tri_n[tid]
        n_tri = (tn[:, 0] * (1.0 - b1 - b2)[:, None] + tn[:, 1] * b1[:, None]
                 + tn[:, 2] * b2[:, None])
        n_tri = n_tri / jnp.maximum(
            jnp.linalg.norm(n_tri, axis=-1, keepdims=True), 1e-20)

        is_sph = pid >= num_t
        qid = jnp.clip(pid - num_t, 0, geom.num_spheres - 1)
        c = geom.sph_c[qid]
        r = geom.sph_r[qid]
        oc = o - c
        b = 2.0 * jnp.sum(oc * d, axis=-1)
        cc = jnp.sum(oc * oc, axis=-1) - r * r
        delta = b * b - 4.0 * cc
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        t1s = (-b - sq) / 2.0
        t2s = (-b + sq) / 2.0
        lim = jnp.minimum(max_t, best_t)
        in1 = (t1s >= min_t) & (t1s <= lim)
        in2 = (t2s >= min_t) & (t2s <= lim)
        t_sph = jnp.where(in1, t1s, t2s)
        sph_ok = is_sph & (delta >= 0) & (in1 | in2)
        p_hit = o + t_sph[:, None] * d
        n_sph = (p_hit - c)
        n_sph = n_sph / jnp.maximum(
            jnp.linalg.norm(n_sph, axis=-1, keepdims=True), 1e-20)

        t_out = jnp.where(tri_ok, t_tri, jnp.where(sph_ok, t_sph, INF_D))
        n_out = jnp.where(tri_ok[:, None], n_tri,
                          jnp.where(sph_ok[:, None], n_sph, 0.0))
        mat = jnp.where(tri_ok, geom.tri_mat[tid],
                        jnp.where(sph_ok, geom.sph_mat[qid], -1))
        return t_out, n_out, mat

    def cond(state):
        ptr = state[0]
        if any_hit:
            return jnp.any((ptr < n_nodes) & ~state[1])
        return jnp.any(ptr < n_nodes)

    def body(state):
        ptr, hit_flag, best_t, best_n, best_mat, best_prim = state
        idx = jnp.clip(ptr, 0, n_nodes - 1)
        active = ptr < n_nodes
        lo = bvh.bounds_lo[idx]
        hi = bvh.bounds_hi[idx]
        box_hit = active & _bvh_slab(o, inv_d, lo, hi, min_t,
                                     jnp.minimum(max_t, best_t))
        leaf = bvh.is_leaf[idx]
        start = bvh.prim_start[idx]
        count = bvh.prim_count[idx]
        do_leaf = box_hit & leaf
        for pid in _leaf_prims(geom, bvh, start, count, 4):
            pid = jnp.where(do_leaf, pid, -1)
            t, n, mat = test_prim(pid, best_t)
            closer = t < best_t
            best_n = jnp.where(closer[:, None], n, best_n)
            best_mat = jnp.where(closer, mat, best_mat)
            best_prim = jnp.where(closer, pid, best_prim)
            best_t = jnp.where(closer, t, best_t)
            hit_flag = hit_flag | closer
        nxt = jnp.where(box_hit & ~leaf, idx + 1, bvh.escape[idx])
        ptr = jnp.where(active, nxt, ptr)
        if any_hit:
            ptr = jnp.where(hit_flag, n_nodes, ptr)
        return (ptr, hit_flag, best_t, best_n, best_mat, best_prim)

    state = (
        jnp.zeros((r_count,), jnp.int32),
        jnp.zeros((r_count,), bool),
        jnp.full((r_count,), INF_D, o.dtype),
        jnp.zeros((r_count, 3), o.dtype),
        jnp.full((r_count,), -1, jnp.int32),
        jnp.full((r_count,), -1, jnp.int32),
    )
    state = jax.lax.while_loop(cond, body, state)
    _, hit_flag, best_t, best_n, best_mat, best_prim = state
    if any_hit:
        return hit_flag
    return Hit(t=best_t, valid=best_t < INF_D, n=best_n, mat=best_mat,
               prim=best_prim)


# --- scene-level dispatch ---------------------------------------------------

# Below this triangle count the VMEM-resident brute-force kernel wins (the
# whole soup is tested anyway and there is no per-cluster control overhead);
# above it the two-level clustered kernel streams only the clusters each
# ray tile touches (ops/intersect_clustered.py).  Crossover measured on
# chip: brute ~equals clustered at ~8k tris, loses 5x+ by 28k (BENCH notes).
_PALLAS_BRUTE_PREF = 8192
_PALLAS_MAX_TRIS = 131072  # hard VMEM cap for the brute kernel's [9,T] soa


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# Sort rays by their FIRST-CROSSED small cluster before the clustered
# kernel.  The kernel streams, per 256-ray tile, the UNION of clusters any
# ray in the tile cuts; incoherent bounce wavefronts make that union huge
# (measured on CBbunny: ~81 clusters/tile streamed while each ray needs
# ~1-10 — the r03 offline study in BENCH_NOTES.md).  Geometric keys
# (origin Morton + direction octant) do NOT shrink the union: "fat"
# clusters that span the whole scene pass every slab test at t~0, and
# rays from one origin fan out everywhere.  Keying each ray by the id of
# the first small-volume cluster its segment cuts (a cheap jnp slab
# pre-pass over the cluster table) groups rays that will stream the SAME
# clusters into the same tile (measured: 81 -> 34 clusters/tile), and
# bunches dead lanes (empty t-windows -> no crossing -> tail key) into
# all-dead tiles the kernel skips outright.
#
# Results are bitwise identical — a ray's candidate set always contains
# its true closest hit regardless of tile grouping, and the
# min-over-global-index tie rule is tile-independent — so this is purely
# a performance transform (test_sorted_dispatch_matches).
_SORT_RAYS = os.environ.get("BDPT_TPU_SORT", "1") != "0"
# Walk (closest-hit) launches default to the cheap Morton key; set
# BDPT_TPU_WALK_SORT=fc to use the first-crossed-cluster key there too
# (the shadow batch always uses it).
_WALK_SORT_FC = os.environ.get("BDPT_TPU_WALK_SORT", "") == "fc"
_SORT_MIN_RAYS = 4096       # sorting overhead is not worth it on tiny sets
_FAT_VOL_FRAC = 0.05        # clusters above this scene-volume fraction are
                            # "fat": every tile streams them anyway, so
                            # they carry no grouping information


def _ray_sort_perm(clusters, o, d, min_t, max_t):
    """[R] permutation: rays ordered by (first-crossed small cluster id,
    direction octant); rays crossing no small cluster (incl. dead lanes)
    sort to the back.  (Test/diagnostic surface; production dispatch uses
    the key directly with payload-carrying sorts.)"""
    return jnp.argsort(_ray_sort_perm_key(clusters, o, d, min_t, max_t))


def _ray_sort_perm_key(clusters, o, d, min_t, max_t):
    """[R] int32 sort key: first-crossed small cluster id * 8 + octant;
    2^30 for rays crossing no small cluster (incl. dead lanes)."""
    r = o.shape[0]
    cb = clusters.cluster_b                       # [8, Cpad]
    cpad = cb.shape[1]
    inv_d = jnp.where(d == 0, INF_D, 1.0 / jnp.where(d == 0, 1.0, d))

    ext = jnp.maximum(cb[3:6] - cb[0:3], 0.0)     # padding slots -> 0
    scene_lo = jnp.min(jnp.where(jnp.isfinite(cb[0:3]), cb[0:3], INF_D),
                       axis=1)
    scene_hi = jnp.max(jnp.where(jnp.isfinite(cb[3:6]), cb[3:6], -INF_D),
                       axis=1)
    scene_vol = jnp.maximum(jnp.prod(scene_hi - scene_lo), 1e-30)
    small = jnp.prod(ext, axis=0) < _FAT_VOL_FRAC * scene_vol  # [Cpad]

    k = 32                                        # clusters per scan chunk
    n_chunks = cpad // k
    lo_c = cb[0:3].T.reshape(n_chunks, k, 3)
    hi_c = cb[3:6].T.reshape(n_chunks, k, 3)
    small_c = small.reshape(n_chunks, k)
    base = jnp.arange(n_chunks, dtype=jnp.int32) * k

    def body(carry, xs):
        best_t, best_c = carry
        lo_i, hi_i, sm_i, b_i = xs
        tmin = jnp.full((k, r), -INF_D)
        tmax = jnp.full((k, r), INF_D)
        for a in range(3):
            u = (lo_i[:, a][:, None] - o[None, :, a]) * inv_d[None, :, a]
            v = (hi_i[:, a][:, None] - o[None, :, a]) * inv_d[None, :, a]
            tmin = jnp.maximum(tmin, jnp.minimum(u, v))
            tmax = jnp.minimum(tmax, jnp.maximum(u, v))
        crossed = ((tmax >= tmin) & (tmax >= min_t[None, :])
                   & (tmin <= max_t[None, :]) & sm_i[:, None])
        tm = jnp.where(crossed, tmin, INF_D)
        cmin = jnp.min(tm, axis=0)                # [r]
        iota = jax.lax.broadcasted_iota(jnp.int32, (k, r), 0)
        cidx = jnp.min(jnp.where(tm <= cmin[None, :], iota + b_i,
                                 jnp.int32(2 ** 30)), axis=0)
        upd = cmin < best_t
        return (jnp.where(upd, cmin, best_t),
                jnp.where(upd, cidx, best_c)), None

    init = (jnp.full((r,), INF_D), jnp.full((r,), 2 ** 30, jnp.int32))
    (_, first_c), _ = jax.lax.scan(body, init, (lo_c, hi_c, small_c, base))

    octant = ((d[:, 0] > 0).astype(jnp.int32)
              | ((d[:, 1] > 0).astype(jnp.int32) << 1)
              | ((d[:, 2] > 0).astype(jnp.int32) << 2))
    return jnp.where(first_c < 2 ** 30, first_c * 8 + octant, 2 ** 30)


def _morton_key(clusters, o, d):
    """[R] int32 key (direction octant, 21-bit origin Morton) — the
    cheap geometric key used for the WALK launches (one launch per bounce,
    wavefront-sized; measured +4% on CBbunny vs unsorted, and the
    first-cluster pre-pass does not pay for itself at this launch size)."""
    cb = clusters.cluster_b
    lo = jnp.min(jnp.where(jnp.isfinite(cb[0:3]), cb[0:3], INF_D), axis=1)
    hi = jnp.max(jnp.where(jnp.isfinite(cb[3:6]), cb[3:6], -INF_D), axis=1)
    ext = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((o - lo) / ext * 127.0, 0.0, 127.0).astype(jnp.int32)
    m = jnp.zeros(o.shape[:1], jnp.int32)
    for b in range(7):
        for a in range(3):
            m = m | (((q[:, a] >> b) & 1) << (3 * b + a))
    octant = ((d[:, 0] > 0).astype(jnp.int32)
              | ((d[:, 1] > 0).astype(jnp.int32) << 1)
              | ((d[:, 2] > 0).astype(jnp.int32) << 2))
    return (octant << 21) | m


# TPU gathers run at ~0.35G rows/s (r03 trace: permuting the 6.2M-lane
# shadow batch's ray arrays cost 0.32 s/pass while the argsort itself was
# 19 ms).  Variadic lax.sort CARRIES payload operands through its vector
# merge network instead, so reordering rays costs ~the sort, not gathers.
def _sort_with_payload(key, arrays):
    """Sort arrays by key; returns (orig_ids_in_sorted_order, arrays)."""
    r = key.shape[0]
    idx = jnp.arange(r, dtype=jnp.int32)
    out = jax.lax.sort((key, idx) + tuple(arrays), dimension=0, num_keys=1)
    return out[1], out[2:]


def _unsort_payload(idx_sorted, arrays):
    """Inverse of _sort_with_payload: restore lane order for results."""
    out = jax.lax.sort((idx_sorted,) + tuple(arrays), dimension=0,
                       num_keys=1)
    return out[1:]


def _sorted_clustered_intersect(scene, o, d, min_t, max_t) -> Hit:
    from bidirectional_pathtracing_tpu.ops.intersect_clustered import (
        intersect_clustered, resolve_clustered_hit,
        tri_closest_hit_clustered)
    r = o.shape[0]
    min_b = jnp.broadcast_to(jnp.asarray(min_t, o.dtype), (r,))
    max_b = jnp.broadcast_to(jnp.asarray(max_t, o.dtype), (r,))
    if not _SORT_RAYS or r < _SORT_MIN_RAYS:
        return intersect_clustered(scene.geometry, scene.clusters,
                                   o, d, min_b, max_b)
    if _WALK_SORT_FC:
        key = _ray_sort_perm_key(scene.clusters, o, d, min_b, max_b)
    else:
        key = _morton_key(scene.clusters, o, d)
    idx_s, (o0, o1, o2, d0, d1, d2, mn, mx) = _sort_with_payload(
        key, (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
              min_b, max_b))
    t_s, slot_s = tri_closest_hit_clustered(
        scene.clusters, jnp.stack([o0, o1, o2], -1),
        jnp.stack([d0, d1, d2], -1), mn, mx)
    t, slot = _unsort_payload(idx_s, (t_s, slot_s))
    return resolve_clustered_hit(scene.geometry, scene.clusters, o, d,
                                 min_b, max_b, t, slot)


def _sorted_clustered_occluded(scene, o, d, min_t, max_t):
    """Any-hit with first-crossed-cluster segment sorting.

    The BDPT shadow batch is ONE launch of (s,t)-combos x wavefront lanes
    (~36x the walk size on CBbunny d5) and measured 74% of the whole step
    (r03 trace) — one sort amortized over that launch is easily worth it.
    Invalid/pruned pairs carry empty t-windows -> no crossing -> tail
    key -> they bunch into all-dead tiles whose block slab tests all fail,
    so the kernel skips them outright (the wavefront equivalent of not
    casting the reference's shadow ray at all, bidirection.cpp:418-433)."""
    from bidirectional_pathtracing_tpu.ops.intersect_clustered import (
        tri_closest_hit_clustered)
    r = o.shape[0]
    min_b = jnp.broadcast_to(jnp.asarray(min_t, o.dtype), (r,))
    max_b = jnp.broadcast_to(jnp.asarray(max_t, o.dtype), (r,))
    key = _ray_sort_perm_key(scene.clusters, o, d, min_b, max_b)
    idx_s, (o0, o1, o2, d0, d1, d2, mn, mx) = _sort_with_payload(
        key, (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
              min_b, max_b))
    _, slot_s = tri_closest_hit_clustered(
        scene.clusters, jnp.stack([o0, o1, o2], -1),
        jnp.stack([d0, d1, d2], -1), mn, mx, any_hit=True)
    (slot,) = _unsort_payload(idx_s, (slot_s,))
    hit = slot >= 0
    geom = scene.geometry
    if geom.num_spheres > 0:
        ts, hs = sphere_intersect_batch(
            o, d, geom.sph_c, geom.sph_r, min_b, max_b)
        hit = hit | jnp.any(hs & geom.sph_valid[None, :], axis=-1)
    return hit


def scene_intersect(scene, o, d, min_t, max_t) -> Hit:
    """Closest-hit dispatch.

    TPU: small scenes take the VMEM-resident brute-force Pallas kernel;
    large scenes take the two-level clustered Pallas kernel (the role of
    the reference's BVH traversal, bvh.cpp:161-188).  CPU: BVH escape-link
    traversal when attached, else the jnp chunked scan.
    """
    if _on_tpu():
        n_t = scene.geometry.num_tris
        use_clusters = scene.clusters is not None and (
            n_t > _PALLAS_BRUTE_PREF or n_t > _PALLAS_MAX_TRIS)
        if use_clusters:
            return _sorted_clustered_intersect(scene, o, d, min_t, max_t)
        if n_t <= _PALLAS_MAX_TRIS:
            from bidirectional_pathtracing_tpu.ops.intersect_pallas import (
                intersect_pallas, make_tri_soa)
            return intersect_pallas(scene.geometry,
                                    make_tri_soa(scene.geometry),
                                    o, d, min_t, max_t)
        # > 131k tris with no clusters attached: fall through to BVH/scan.
    if scene.bvh is not None:
        return intersect_bvh(scene.geometry, scene.bvh, o, d, min_t, max_t)
    return intersect(scene.geometry, o, d, min_t, max_t)


def scene_occluded(scene, o, d, min_t, max_t):
    if _on_tpu():
        n_t = scene.geometry.num_tris
        use_clusters = scene.clusters is not None and (
            n_t > _PALLAS_BRUTE_PREF or n_t > _PALLAS_MAX_TRIS)
        if use_clusters:
            # early-exit any-hit variant: a hit poisons the ray's window so
            # its remaining cluster streams are skipped
            from bidirectional_pathtracing_tpu.ops.intersect_clustered \
                import occluded_clustered
            if _SORT_RAYS and o.shape[0] >= _SORT_MIN_RAYS:
                return _sorted_clustered_occluded(scene, o, d, min_t, max_t)
            return occluded_clustered(scene.geometry, scene.clusters,
                                      o, d, min_t, max_t)
        # brute force has no early-out advantage, but occlusion needs no
        # RESOLVE either: skip the winner recompute (normal interp + tri
        # gathers + sphere merge) whose gathers measured ~35% of the
        # CBspheres step on the 36-combo shadow batch (r04 trace,
        # fusion.3353 + friends) — a boolean only needs (slot >= 0) and
        # an any-sphere test
        if n_t <= _PALLAS_MAX_TRIS:
            from bidirectional_pathtracing_tpu.ops.intersect_pallas import (
                make_sph_soa, make_tri_soa, tri_closest_hit_pallas)
            g = scene.geometry
            r = o.shape[0]
            min_b = jnp.broadcast_to(jnp.asarray(min_t, o.dtype), (r,))
            max_b = jnp.broadcast_to(jnp.asarray(max_t, o.dtype), (r,))
            _, slot = tri_closest_hit_pallas(
                make_tri_soa(g), o, d, min_b, max_b,
                sph_soa=make_sph_soa(g), num_tris=g.num_tris)
            return slot >= 0
        return scene_intersect(scene, o, d, min_t, max_t).valid
    if scene.bvh is not None:
        return intersect_bvh(scene.geometry, scene.bvh, o, d, min_t, max_t,
                             any_hit=True)
    return occluded(scene.geometry, o, d, min_t, max_t)


def scene_occluded_segment(scene, a, b, rel_eps: float = 2e-4, active=None):
    """occluded_segment with accelerator dispatch.

    active: optional [R] mask; inactive segments get an empty t-window
    (reported unblocked — callers mask their contributions anyway) so the
    any-hit TPU kernel skips their cluster streams.
    """
    d = b - a
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-20))
    conn = d / dist[..., None]
    max_t = dist * (1.0 - rel_eps) - EPS_F
    if active is not None:
        max_t = jnp.where(active, max_t, -1.0)
    blocked = scene_occluded(scene, a, conn, EPS_F, max_t)
    return blocked, conn, dist
