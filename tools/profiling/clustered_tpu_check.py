"""Smoke + timing of the clustered kernel on the real TPU chip.

Usage: python tools/profiling/clustered_tpu_check.py [n_tris ...]
Compares clustered vs brute Pallas kernel on random meshes and CBbunny.
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
from bidirectional_pathtracing_tpu.ops.intersect_pallas import (
    intersect_pallas, make_tri_soa)
from bidirectional_pathtracing_tpu.scene.clusters import build_clusters
from tests.test_clustered import _random_mesh, _random_rays


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    print("backend:", jax.default_backend(), jax.devices())
    sizes = [int(s) for s in sys.argv[1:]] or [4096, 28000, 131072, 262144]
    n_rays = 131072
    for n_tris in sizes:
        geom = _random_mesh(n_tris, seed=0)
        clusters = build_clusters(geom)
        o, d = _random_rays(n_rays, seed=1)
        dt_c, hit_c = bench(
            lambda: intersect_clustered(geom, clusters, o, d, 1e-4, INF_D))
        print(f"T={n_tris:7d} clustered: {dt_c*1e3:8.2f} ms "
              f"({n_rays/dt_c/1e6:7.2f} Mrays/s) "
              f"C={clusters.n_clusters} hits={int(hit_c.valid.sum())}")
        if n_tris <= 131072:
            soa = make_tri_soa(geom)
            dt_b, hit_b = bench(
                lambda: intersect_pallas(geom, soa, o, d, 1e-4, INF_D))
            print(f"          brute:     {dt_b*1e3:8.2f} ms "
                  f"({n_rays/dt_b/1e6:7.2f} Mrays/s) "
                  f"hits={int(hit_b.valid.sum())}")
            agree = np.mean(np.asarray(hit_b.prim) == np.asarray(hit_c.prim))
            print(f"          prim agreement: {agree:.6f}")


if __name__ == "__main__":
    main()
