"""Sweep the clustered kernel's TILE_R on CBbunny camera+bounce rays.

    python tools/profiling/tile_sweep.py [tile ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bidirectional_pathtracing_tpu.core.math import INF_D
from bidirectional_pathtracing_tpu.ops import intersect_clustered as ic
from bidirectional_pathtracing_tpu.ops import camera_ops
from bidirectional_pathtracing_tpu.scene.build import load_scene


def bench(fn, iters=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    tiles = [int(t) for t in sys.argv[1:]] or [256, 512, 1024]
    w, h = 480, 360
    scene, aux = load_scene("/root/reference/dae/sky/CBbunny.dae", w, h)
    clusters = scene.clusters
    pix = jnp.arange(w * h)
    x = ((pix % w).astype(jnp.float32) + 0.5) / w
    y = ((pix // w).astype(jnp.float32) + 0.5) / h
    o, d = camera_ops.generate_ray(scene.camera, x, y)
    n = o.shape[0]

    hit0 = None
    for tile in tiles:
        ic.TILE_R = tile
        ic.tri_closest_hit_clustered.clear_cache()
        dt, hit = bench(lambda: ic.intersect_clustered(
            scene.geometry, clusters, o, d, 1e-3, INF_D))
        agree = (1.0 if hit0 is None else
                 float(np.mean(np.asarray(hit.prim)
                               == np.asarray(hit0.prim))))
        hit0 = hit0 if hit0 is not None else hit
        print(f"TILE_R={tile:5d} primary: {dt*1e3:8.2f} ms ({n/dt/1e6:5.2f} "
              f"Mrays/s) agree={agree:.6f}", flush=True)
        hp = jnp.where(hit.valid[:, None], o + hit.t[:, None] * d, 0.0)
        rd = jax.random.normal(jax.random.key(1), (n, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        dt2, hit2 = bench(lambda: ic.intersect_clustered(
            scene.geometry, clusters, hp, rd, 1e-3, INF_D))
        print(f"TILE_R={tile:5d} bounce:  {dt2*1e3:8.2f} ms "
              f"({n/dt2/1e6:5.2f} Mrays/s) hits={int(hit2.valid.sum())}",
              flush=True)


if __name__ == "__main__":
    main()
