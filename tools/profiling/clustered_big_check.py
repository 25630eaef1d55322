"""Clustered kernel on a cached big mesh (457k-tri subdivided CBbunny).

Build the cache once (CPU):
    scene, _ = load_scene(CBbunny, mesh_ops=("upsample","upsample"))
    np.savez("/tmp/bunny_up2.npz", tri_p=..., tri_n=..., tri_mat=...)
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


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bunny_up2.npz"
    d = np.load(path)
    geom = make_geometry(d["tri_p"], d["tri_n"], d["tri_mat"])
    print("tris:", geom.num_tris)
    t0 = time.perf_counter()
    clusters = build_clusters(geom)
    print(f"clusters: C={clusters.n_clusters} blocks={clusters.n_blocks} "
          f"in {time.perf_counter()-t0:.1f}s")

    # camera-like rays: origin outside bbox, directions toward bbox points
    lo = d["tri_p"].reshape(-1, 3).min(0)
    hi = d["tri_p"].reshape(-1, 3).max(0)
    center = (lo + hi) / 2
    eye = center + (hi - lo) * np.array([0, 0.25, 2.5])
    rng = np.random.default_rng(0)
    n = 172800
    targets = rng.uniform(lo, hi, (n, 3))
    o = jnp.asarray(np.broadcast_to(eye, (n, 3)).astype(np.float32))
    dirs = (targets - eye).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dd = jnp.asarray(dirs)

    dt, hit = bench(lambda: intersect_clustered(
        geom, clusters, o, dd, 1e-3, INF_D))
    print(f"primary-ish: {dt*1e3:8.2f} ms ({n/dt/1e6:6.2f} Mrays/s) "
          f"hits={int(hit.valid.sum())}")

    # bounce rays from hit points
    hp = jnp.where(hit.valid[:, None], o + hit.t[:, None] * dd, 0.0)
    rd = jax.random.normal(jax.random.key(1), (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    dt2, hit2 = bench(lambda: intersect_clustered(
        geom, clusters, hp, rd, 1e-3, INF_D))
    print(f"bounce:      {dt2*1e3:8.2f} ms ({n/dt2/1e6:6.2f} Mrays/s) "
          f"hits={int(hit2.valid.sum())}")


if __name__ == "__main__":
    main()
