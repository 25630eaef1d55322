"""Does Morton-ordering rays speed up the clustered kernel?

Compares scanline-order vs Morton-tile-order primary rays, and unsorted
vs origin-Morton-sorted bounce rays, on the cached 457k-tri bunny.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bidirectional_pathtracing_tpu.core.math import INF_D
from bidirectional_pathtracing_tpu.ops.intersect_clustered import (
    intersect_clustered)
from bidirectional_pathtracing_tpu.scene.clusters import build_clusters
from bidirectional_pathtracing_tpu.scene.types import make_geometry


def bench(fn, iters=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def morton2(x, y, bits=9):
    out = np.zeros_like(x, dtype=np.uint32)
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def morton3(q, bits=8):
    out = np.zeros(q.shape[0], dtype=np.uint64)
    for b in range(bits):
        for a in range(3):
            out |= ((q[:, a].astype(np.uint64) >> b) & 1) << (3 * b + a)
    return out


def main():
    d = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bunny_up2.npz")
    geom = make_geometry(d["tri_p"], d["tri_n"], d["tri_mat"])
    # cluster build from HOST arrays (no device->host pull over the tunnel)
    host = geom._replace(tri_p=d["tri_p"].astype(np.float32),
                         tri_valid=np.ones(d["tri_p"].shape[0], bool))
    t0 = time.perf_counter()
    clusters = build_clusters(host)
    print(f"C={clusters.n_clusters} built in {time.perf_counter()-t0:.1f}s")

    lo = d["tri_p"].reshape(-1, 3).min(0)
    hi = d["tri_p"].reshape(-1, 3).max(0)
    center = (lo + hi) / 2
    eye = center + (hi - lo) * np.array([0, 0.25, 2.5])

    w, h = 480, 360
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    xs, ys = xs.ravel(), ys.ravel()
    # pinhole-ish: dirs through a view plane toward -z of eye
    span = (hi - lo) * 0.6
    px = lo[0] + (xs + 0.5) / w * (hi[0] - lo[0])
    py = lo[1] + (ys + 0.5) / h * (hi[1] - lo[1])
    targets = np.stack([px, py, np.full_like(px, center[2])], -1)
    dirs = (targets - eye).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    n = dirs.shape[0]
    o = jnp.asarray(np.broadcast_to(eye, (n, 3)).astype(np.float32))
    dd = jnp.asarray(dirs)

    dt, hit = bench(lambda: intersect_clustered(geom, clusters, o, dd,
                                                1e-3, INF_D))
    print(f"primary scanline: {dt*1e3:8.2f} ms ({n/dt/1e6:5.2f} Mrays/s) "
          f"hits={int(hit.valid.sum())}")

    if "--morton-primary" in sys.argv:
        order = np.argsort(morton2(xs.astype(np.uint32),
                                   ys.astype(np.uint32)))
        o2 = o[order]
        d2 = dd[jnp.asarray(order)]
        dt2, hit2 = bench(lambda: intersect_clustered(geom, clusters, o2, d2,
                                                      1e-3, INF_D))
        print(f"primary morton:   {dt2*1e3:8.2f} ms "
              f"({n/dt2/1e6:5.2f} Mrays/s) hits={int(hit2.valid.sum())}")

    # bounce rays: origins at hits, random dirs
    hp = np.asarray(jnp.where(hit.valid[:, None],
                              o + hit.t[:, None] * dd, 0.0))
    rd = np.asarray(jax.random.normal(jax.random.key(1), (n, 3)))
    rd = (rd / np.linalg.norm(rd, axis=-1, keepdims=True)).astype(np.float32)
    hpj, rdj = jnp.asarray(hp), jnp.asarray(rd)
    dt3, hit3 = bench(lambda: intersect_clustered(geom, clusters, hpj, rdj,
                                                  1e-3, INF_D))
    print(f"bounce unsorted:  {dt3*1e3:8.2f} ms ({n/dt3/1e6:5.2f} Mrays/s) "
          f"hits={int(hit3.valid.sum())}")

    ext = np.maximum(hi - lo, 1e-9)
    q = np.clip(((hp - lo) / ext * 255), 0, 255).astype(np.uint32)
    oct_ = ((rd[:, 0] > 0).astype(np.uint64)
            | ((rd[:, 1] > 0).astype(np.uint64) << np.uint64(1))
            | ((rd[:, 2] > 0).astype(np.uint64) << np.uint64(2)))
    key = (oct_ << np.uint64(24)) | morton3(q)
    order3 = np.argsort(key)
    hps, rds = hpj[jnp.asarray(order3)], rdj[jnp.asarray(order3)]
    dt4, hit4 = bench(lambda: intersect_clustered(geom, clusters, hps, rds,
                                                  1e-3, INF_D))
    print(f"bounce sorted:    {dt4*1e3:8.2f} ms ({n/dt4/1e6:5.2f} Mrays/s) "
          f"hits={int(hit4.valid.sum())}")


if __name__ == "__main__":
    main()
