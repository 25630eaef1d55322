"""Microbenchmark: per-cluster intersection cost variants on the chip.

The clustered kernel's closest-hit launches are 74% of the CBbunny BDPT
step (BENCH_NOTES.md).  A first run of this bench measured the production
Moller-Trumbore math at ~7.8 us/cluster = ~230 Gflop/s — a few % of VPU
peak — and an MXU linear-form rewrite at the SAME speed, so the bottleneck
is not flop count.  Suspects: register spill of the ~15 live [128, 256]
intermediates (32 vregs each) into VMEM, and the serial best_t dependency
chain between consecutive clusters.  Variants (DMA excluded; data
preloaded in VMEM):

  vpu         production mt_cluster math (ops/intersect_clustered.py:79)
  vpu-late    best_t/max_t dropped from the per-element test and applied
              to the reduced per-ray cluster-min instead (equivalent
              closest-hit semantics; breaks the inter-cluster dependency)
  vpu-chunk   late + triangles processed in [16, R] sub-chunks so the
              live set fits in vector registers
  mxu         MT numerators as one [4*TC, 16] @ [16, R] MXU matmul over
              per-ray features z = [o, d, o x d, 1] + VPU epilogue
  mxu-late    mxu with the late-limit epilogue, chunked [128, R]

Run on the chip:  python tools/profiling/mxu_mt_bench.py [iters] [R]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TC = 128      # triangles per cluster
NSLOT = 8     # preloaded clusters cycled over
INF = 3.0e38


def _finish(bt, bi, cmin, cidx, min_t, max_t, late):
    if late:
        closer = (cmin < bt) & (cmin <= max_t)
    else:
        closer = cmin < bt
    return jnp.where(closer, cmin, bt), jnp.where(closer, cidx, bi)


def _vpu_kernel(rays_ref, tris_ref, t_ref, *, iters, r, late, chunk):
    o = [rays_ref[i, :] for i in range(3)]
    d = [rays_ref[3 + i, :] for i in range(3)]
    min_t = rays_ref[6, :]
    max_t = rays_ref[7, :]

    def body(i, carry):
        bt, bi = carry
        slot = jax.lax.rem(i, NSLOT)
        v = [tris_ref[slot, k, :] for k in range(9)]
        cmin = jnp.full((r,), INF, jnp.float32)
        cidx = jnp.full((r,), INF, jnp.float32)
        for cs in range(0, TC, chunk):
            sl = slice(cs, cs + chunk)
            vc = [vk[sl] for vk in v]
            e1 = [vc[3 + k] - vc[k] for k in range(3)]
            e2 = [vc[6 + k] - vc[k] for k in range(3)]
            s = [o[k][None, :] - vc[k][:, None] for k in range(3)]
            s1 = [d[(k + 1) % 3][None, :] * e2[(k + 2) % 3][:, None]
                  - d[(k + 2) % 3][None, :] * e2[(k + 1) % 3][:, None]
                  for k in range(3)]
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
                  & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1))
            if not late:
                ok = ok & (t <= jnp.minimum(max_t, bt)[None, :])
            tm = jnp.where(ok, t, INF)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, r), 0).astype(jnp.float32) + float(cs)
            kmin = jnp.min(tm, axis=0)
            kidx = jnp.min(jnp.where(tm <= kmin[None, :], iota, INF), axis=0)
            upd = kmin < cmin
            cmin = jnp.where(upd, kmin, cmin)
            cidx = jnp.where(upd, kidx, cidx)
        return _finish(bt, bi, cmin, cidx, min_t, max_t, late)

    bt = jnp.full((r,), INF, jnp.float32)
    bi = jnp.full((r,), -1.0, jnp.float32)
    bt, bi = jax.lax.fori_loop(0, iters, body, (bt, bi))
    t_ref[0, :] = bt
    t_ref[1, :] = bi


def _mxu_kernel(rays_ref, amat_ref, t_ref, *, iters, r, late, chunk):
    o = [rays_ref[i, :] for i in range(3)]
    d = [rays_ref[3 + i, :] for i in range(3)]
    min_t = rays_ref[6, :]
    max_t = rays_ref[7, :]
    c = [o[(k + 1) % 3] * d[(k + 2) % 3] - o[(k + 2) % 3] * d[(k + 1) % 3]
         for k in range(3)]
    zero = jnp.zeros((r,), jnp.float32)
    z = jnp.stack(o + d + c + [jnp.ones((r,), jnp.float32)]
                  + [zero] * 6)                      # [16, R]

    def body(i, carry):
        bt, bi = carry
        slot = jax.lax.rem(i, NSLOT)
        out = jnp.dot(amat_ref[slot], z,
                      preferred_element_type=jnp.float32)   # [4*TC, R]
        cmin = jnp.full((r,), INF, jnp.float32)
        cidx = jnp.full((r,), INF, jnp.float32)
        for cs in range(0, TC, chunk):
            denom = out[0 * TC + cs:0 * TC + cs + chunk, :]
            t_num = out[1 * TC + cs:1 * TC + cs + chunk, :]
            b1_num = out[2 * TC + cs:2 * TC + cs + chunk, :]
            b2_num = out[3 * TC + cs:3 * TC + cs + chunk, :]
            inv = jnp.where(denom == 0, 0.0,
                            1.0 / jnp.where(denom == 0, 1.0, denom))
            t = t_num * inv
            b1 = b1_num * inv
            b2 = b2_num * inv
            ok = ((denom != 0) & (t >= min_t[None, :])
                  & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1))
            if not late:
                ok = ok & (t <= jnp.minimum(max_t, bt)[None, :])
            tm = jnp.where(ok, t, INF)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, r), 0).astype(jnp.float32) + float(cs)
            kmin = jnp.min(tm, axis=0)
            kidx = jnp.min(jnp.where(tm <= kmin[None, :], iota, INF), axis=0)
            upd = kmin < cmin
            cmin = jnp.where(upd, kmin, cmin)
            cidx = jnp.where(upd, kidx, cidx)
        return _finish(bt, bi, cmin, cidx, min_t, max_t, late)

    bt = jnp.full((r,), INF, jnp.float32)
    bi = jnp.full((r,), -1.0, jnp.float32)
    bt, bi = jax.lax.fori_loop(0, iters, body, (bt, bi))
    t_ref[0, :] = bt
    t_ref[1, :] = bi


def amat_from_tris(tris):
    """tris [NSLOT, 16, TC] -> A [NSLOT, 4*TC, 16] linear-form matrices."""
    v0 = tris[:, 0:3, :].transpose(0, 2, 1)   # [S, TC, 3]
    v1 = tris[:, 3:6, :].transpose(0, 2, 1)
    v2 = tris[:, 6:9, :].transpose(0, 2, 1)
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    a = np.zeros((tris.shape[0], 4, tris.shape[2], 16), np.float32)
    a[:, 0, :, 3:6] = -n                                   # denom = -n.d
    a[:, 1, :, 0:3] = n                                    # t_num = n.o - n.v0
    a[:, 1, :, 9] = -np.sum(n * v0, -1)
    a[:, 2, :, 6:9] = e2                                   # b1 = e2.c - (e2xv0).d
    a[:, 2, :, 3:6] = -np.cross(e2, v0)
    a[:, 3, :, 6:9] = -e1                                  # b2 = -e1.c - (v0xe1).d
    a[:, 3, :, 3:6] = -np.cross(v0, e1)
    return a.reshape(tris.shape[0], 4 * tris.shape[2], 16)


def run(iters=4096, r=256):
    rng = np.random.default_rng(0)
    tris = rng.uniform(-1, 1, (NSLOT, 16, TC)).astype(np.float32)
    tris[:, 9:, :] = 0
    rays = np.zeros((8, r), np.float32)
    rays[0:3] = rng.uniform(-2, 2, (3, r))
    dd = rng.normal(size=(3, r))
    rays[3:6] = dd / np.linalg.norm(dd, axis=0)
    rays[6] = 1e-4
    rays[7] = 1e9
    amat = amat_from_tris(tris)

    def launch(kernel, tridata, name, **kw):
        f = pl.pallas_call(
            functools.partial(kernel, iters=iters, r=r, **kw),
            out_shape=jax.ShapeDtypeStruct((2, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        g = jax.jit(lambda a, b: f(a, b))
        out = np.asarray(g(rays, tridata))   # compile + run
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = np.asarray(g(rays, tridata))
        dt = (time.perf_counter() - t0) / reps
        us = dt / iters * 1e6
        gf = 55 * TC * r / us / 1e3
        print(f"{name:11s} R={r}: {dt*1e3:8.2f} ms / {iters} clusters"
              f" -> {us:6.3f} us/cluster ({gf:7.1f} Gflop/s MT-equiv)"
              f"  hits={int((out[1] >= 0).sum())}", flush=True)
        return out, us

    o1, t1 = launch(_vpu_kernel, tris, "vpu", late=False, chunk=TC)
    runs = [
        (_vpu_kernel, tris, "vpu-late", dict(late=True, chunk=TC)),
        (_vpu_kernel, tris, "vpu-chunk16", dict(late=True, chunk=16)),
        (_vpu_kernel, tris, "vpu-chunk32", dict(late=True, chunk=32)),
        (_mxu_kernel, amat, "mxu", dict(late=False, chunk=TC)),
        (_mxu_kernel, amat, "mxu-late32", dict(late=True, chunk=32)),
        
    ]
    for kern, data, name, kw in runs:
        o2, t2 = launch(kern, data, name, **kw)
        agree = np.mean(o1[1] == o2[1])
        print(f"    agree={agree*100:6.2f}%  speedup vs vpu: {t1/t2:.2f}x",
              flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
        int(sys.argv[2]) if len(sys.argv) > 2 else 256)
