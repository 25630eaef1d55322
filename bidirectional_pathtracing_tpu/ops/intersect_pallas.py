"""Pallas TPU kernel for batched ray-triangle closest-hit.

The [KERNEL] path of SURVEY.md section 2.1/2.2: Möller–Trumbore over a
triangle soup, laid out for the TPU vector unit:

  - rays in transposed SoA [8, R] (ox oy oz dx dy dz min_t max_t) so each
    field is a full lane vector; ray tiles of TILE_R columns
  - triangles in transposed SoA [9, T] resident in VMEM, streamed through
    the tile in chunks of TRI_CHUNK with a fori_loop; per-chunk [TC, TILE_R]
    test matrices never touch HBM
  - running closest-hit (t, prim index) per ray via masked min reductions
    (the argmin is computed as min-over-iota to stay in pure VPU ops)

The kernel returns (t, prim); shading data (normal via barycentrics,
material) is gathered afterward with one extra single-triangle evaluation
per ray — cheaper than carrying it through the reduction.

Spheres are IN-KERNEL (closing the SURVEY section 2.2 Sphere [KERNEL]
row): the scene's few spheres ride along as an SMEM scalar table and a
statically-unrolled per-sphere quadratic tail after the triangle chunks
(~25 VPU flops/ray/sphere — noise next to one 128-triangle chunk),
replicating the reference's nearer-in-range-root rule (sphere.cpp:11-57)
and the jnp merge's tie-breaks: triangles beat sphere ties, lower sphere
index wins sphere ties.  Winners carry global prim ids >= num_tris.
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
from bidirectional_pathtracing_tpu.scene.types import Geometry

TILE_R = 512
TRI_CHUNK = 128


def _tri_kernel(rays_ref, tris_ref, sph_ref, t_ref, idx_ref, *, n_chunks,
                n_spheres, n_tris):
    o = [rays_ref[i, :] for i in range(3)]          # [TILE_R]
    d = [rays_ref[3 + i, :] for i in range(3)]
    min_t = rays_ref[6, :]
    max_t = rays_ref[7, :]

    # iota must be integer-typed on TPU; cast for the min-over-index trick
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (TRI_CHUNK, TILE_R), 0).astype(jnp.float32)

    def chunk_body(c, carry):
        best_t, best_i = carry
        base = c * TRI_CHUNK
        v = [tris_ref[k, pl.ds(base, TRI_CHUNK)] for k in range(9)]
        e1 = [v[3 + k] - v[k] for k in range(3)]    # [TC]
        e2 = [v[6 + k] - v[k] for k in range(3)]

        # s = o - v0: [TC, TILE_R]
        s = [o[k][None, :] - v[k][:, None] for k in range(3)]
        # s1 = d x e2
        s1 = [d[(k + 1) % 3][None, :] * e2[(k + 2) % 3][:, None]
              - d[(k + 2) % 3][None, :] * e2[(k + 1) % 3][:, None]
              for k in range(3)]
        # s2 = s x e1
        s2 = [s[(k + 1) % 3] * e1[(k + 2) % 3][:, None]
              - s[(k + 2) % 3] * e1[(k + 1) % 3][:, None]
              for k in range(3)]
        denom = sum(s1[k] * e1[k][:, None] for k in range(3))
        inv = jnp.where(denom == 0, 0.0,
                        1.0 / jnp.where(denom == 0, 1.0, denom))
        t = sum(s2[k] * e2[k][:, None] for k in range(3)) * inv
        b1 = sum(s1[k] * s[k] for k in range(3)) * inv
        b2 = sum(s2[k] * d[k][None, :] for k in range(3)) * inv
        ok = ((denom != 0) & (t >= min_t[None, :])
              & (t <= jnp.minimum(max_t, best_t)[None, :])
              & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1))
        tm = jnp.where(ok, t, INF_D)
        cmin = jnp.min(tm, axis=0)                   # [TILE_R]
        hit_iota = jnp.where(tm <= cmin[None, :], iota + base, INF_D)
        cidx = jnp.min(hit_iota, axis=0)
        closer = cmin < best_t
        best_i = jnp.where(closer, cidx, best_i)
        best_t = jnp.where(closer, cmin, best_t)
        return best_t, best_i

    best_t = jnp.full((TILE_R,), INF_D, jnp.float32)
    best_i = jnp.full((TILE_R,), -1.0, jnp.float32)
    best_t, best_i = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                       (best_t, best_i))

    # sphere tail: static unroll over the (few) scene spheres, quadratic
    # with the nearer-in-range root (sphere.cpp:11-57).  Strict < keeps
    # the jnp merge's tie-breaks (triangles win ties; lower sphere index
    # wins — ascending q with strict <).
    a_d = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    for q in range(n_spheres):
        cx, cy, cz = sph_ref[0, q], sph_ref[1, q], sph_ref[2, q]
        rr, valid = sph_ref[3, q], sph_ref[4, q]
        ocx, ocy, ocz = o[0] - cx, o[1] - cy, o[2] - cz
        b = 2.0 * (ocx * d[0] + ocy * d[1] + ocz * d[2])
        cc = ocx * ocx + ocy * ocy + ocz * ocz - rr * rr
        delta = b * b - 4.0 * a_d * cc
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        t1 = (-b - sq) / (2.0 * a_d)
        t2 = (-b + sq) / (2.0 * a_d)
        lim = jnp.minimum(max_t, best_t)
        in1 = (t1 >= min_t) & (t1 <= lim)
        in2 = (t2 >= min_t) & (t2 <= lim)
        ts = jnp.where(in1, t1, t2)
        ok = (valid > 0.0) & (delta >= 0.0) & (in1 | in2)
        ts = jnp.where(ok, ts, INF_D)
        closer = ts < best_t
        best_i = jnp.where(closer, jnp.float32(n_tris + q), best_i)
        best_t = jnp.where(closer, ts, best_t)

    t_ref[0, :] = best_t
    idx_ref[0, :] = best_i


@functools.partial(jax.jit, static_argnames=("num_tris", "interpret"))
def tri_closest_hit_pallas(tri_soa, o, d, min_t, max_t, sph_soa=None,
                           num_tris=None, interpret=False):
    """tri_soa: [9, Tpad] transposed triangle vertices.  Returns
    (t [R], prim f32 [R] with -1 for miss).

    sph_soa: optional [5, Q] SMEM sphere table (cx cy cz r valid) +
    static num_tris — spheres are then tested in-kernel and winners get
    global prim ids num_tris + q."""
    r = o.shape[0]
    rp = _ceil_to(r, TILE_R)
    n_spheres = 0 if sph_soa is None else sph_soa.shape[1]
    if sph_soa is None:
        sph_soa = jnp.zeros((5, 1), jnp.float32)

    def pad(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((rp - r,) + a.shape[1:], fill, a.dtype)])

    rays = jnp.stack([
        pad(o[:, 0]), pad(o[:, 1]), pad(o[:, 2]),
        pad(d[:, 0]), pad(d[:, 1]), pad(d[:, 2], 1.0),
        pad(jnp.broadcast_to(min_t, (r,))),
        pad(jnp.broadcast_to(max_t, (r,)), -1.0),
    ])  # [8, rp]
    n_chunks = tri_soa.shape[1] // TRI_CHUNK

    t, idx = pl.pallas_call(
        functools.partial(_tri_kernel, n_chunks=n_chunks,
                          n_spheres=n_spheres, n_tris=num_tris or 0),
        grid=(rp // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tri_soa.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sph_soa.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
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
        interpret=interpret,
    )(rays, tri_soa, sph_soa)
    return t[0, :r], idx[0, :r]


def make_sph_soa(geom: Geometry):
    """[5, Q] sphere table (cx cy cz r valid) for the in-kernel sphere
    tail, or None when the scene has no spheres."""
    if geom.num_spheres == 0:
        return None
    return jnp.concatenate([
        geom.sph_c.T, geom.sph_r[None, :],
        geom.sph_valid[None, :].astype(jnp.float32)]).astype(jnp.float32)


def make_tri_soa(geom: Geometry):
    """[9, Tpad] transposed vertex layout; invalid/padded tris degenerate."""
    tp = jnp.where(geom.tri_valid[:, None, None], geom.tri_p, 0.0)
    t = geom.num_tris
    tpad = _ceil_to(max(t, TRI_CHUNK), TRI_CHUNK)
    soa = jnp.zeros((9, tpad), jnp.float32)
    flat = tp.reshape(t, 9).T  # [9, T] (v0xyz v1xyz v2xyz)
    return soa.at[:, :t].set(flat)


# Winner-resolve gather strategy.  geom.tri_p[tid] on [R] winners
# compiles to a f32[R,3,3] gather + layout copy that measured ~10% of the
# whole CBspheres BDPT step (r05 HLO/trace: copy.1619/1634 + slice.22202/
# 22279 on the eye+light walk resolves).  For tiny tables the same rows
# come out of one one-hot [R,Tpad] @ [Tpad,19] MXU matmul at negligible
# cost (CBspheres Tpad=128: 0.4 GFLOP/step).  Bigger brute scenes (up to
# _PALLAS_MAX_TRIS) keep the plain gather — a [R,8192] one-hot would cost
# more HBM than the gather saves.
ONEHOT_RESOLVE_MAX_TRIS = 512


def _resolve_table(geom: Geometry):
    """[Tpad, 19] per-triangle resolve rows: v0|e1|e2|n0|n1-n0|n2-n0|mat
    (mat as f32 — small ints are exact; -1 rows for padding)."""
    t = geom.num_tris
    tpad = _ceil_to(max(t, 8), 128)
    tp = geom.tri_p[:t]
    tn = geom.tri_n[:t]
    rows = jnp.concatenate([
        tp[:, 0], tp[:, 1] - tp[:, 0], tp[:, 2] - tp[:, 0],
        tn[:, 0], tn[:, 1] - tn[:, 0], tn[:, 2] - tn[:, 0],
        geom.tri_mat[:t, None].astype(jnp.float32)], axis=1)
    table = jnp.full((tpad, 19), -1.0, jnp.float32)
    return table.at[:t].set(rows)


def intersect_pallas(geom: Geometry, tri_soa, o, d, min_t, max_t,
                     interpret=False) -> Hit:
    """Closest-hit via the Pallas kernel (triangles + in-kernel spheres)."""
    r = o.shape[0]
    num_t = geom.num_tris
    min_b = jnp.broadcast_to(jnp.asarray(min_t, o.dtype), (r,))
    max_b = jnp.broadcast_to(jnp.asarray(max_t, o.dtype), (r,))
    t, fidx = tri_closest_hit_pallas(tri_soa, o, d, min_b, max_b,
                                     sph_soa=make_sph_soa(geom),
                                     num_tris=num_t, interpret=interpret)
    fi = fidx.astype(jnp.int32)
    found = (fi >= 0) & (t < INF_D)
    sph_hit = found & (fi >= num_t)
    tri_hit = found & (fi < num_t)
    tid = jnp.clip(fi, 0, num_t - 1)

    # recompute barycentrics/normal for the winning triangle only
    if geom.num_tris <= ONEHOT_RESOLVE_MAX_TRIS:
        table = _resolve_table(geom)
        oh = (tid[:, None] == jnp.arange(table.shape[0], dtype=jnp.int32)
              [None, :]).astype(jnp.float32)
        rows = oh @ table                               # [R, 19] via MXU
        v0, e1, e2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
        n0, dn1, dn2 = rows[:, 9:12], rows[:, 12:15], rows[:, 15:18]
        mat_tri = rows[:, 18].astype(jnp.int32)
    else:
        tp = geom.tri_p[tid]
        v0, e1, e2 = tp[:, 0], tp[:, 1] - tp[:, 0], tp[:, 2] - tp[:, 0]
        tn = geom.tri_n[tid]
        n0, dn1, dn2 = tn[:, 0], tn[:, 1] - tn[:, 0], tn[:, 2] - tn[:, 0]
        mat_tri = geom.tri_mat[tid]
    sv = o - v0
    s1 = jnp.cross(d, e2)
    s2 = jnp.cross(sv, e1)
    den = jnp.sum(s1 * e1, axis=-1)
    inv = jnp.where(den == 0, 0.0, 1.0 / jnp.where(den == 0, 1.0, den))
    b1 = jnp.sum(s1 * sv, axis=-1) * inv
    b2 = jnp.sum(s2 * d, axis=-1) * inv
    n_tri = n0 + dn1 * b1[:, None] + dn2 * b2[:, None]
    n_tri = n_tri / jnp.maximum(
        jnp.linalg.norm(n_tri, axis=-1, keepdims=True), 1e-20)

    best_t = jnp.where(found, t, INF_D)
    best_n = jnp.where(tri_hit[:, None], n_tri, 0.0)
    best_mat = jnp.where(tri_hit, mat_tri, -1)
    best_prim = jnp.where(found, fi, -1)

    if geom.num_spheres > 0:
        # sphere-winner resolve: analytic normal from the hit point,
        # attributes via static per-sphere selects (tiny table)
        sc = jnp.zeros((r, 3), o.dtype)
        smat = jnp.zeros((r,), jnp.int32)
        for k in range(geom.num_spheres - 1, -1, -1):
            w = fi == num_t + k
            sc = jnp.where(w[:, None], geom.sph_c[k], sc)
            smat = jnp.where(w, geom.sph_mat[k], smat)
        p_hit = o + best_t[:, None] * d
        n_sph = p_hit - sc
        n_sph = n_sph / jnp.maximum(
            jnp.linalg.norm(n_sph, axis=-1, keepdims=True), 1e-20)
        best_n = jnp.where(sph_hit[:, None], n_sph, best_n)
        best_mat = jnp.where(sph_hit, smat, best_mat)
    return Hit(t=best_t, valid=best_t < INF_D, n=best_n, mat=best_mat,
               prim=best_prim)
