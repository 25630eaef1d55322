"""Realistic clustered-kernel workload: CBbunny camera + bounce rays."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bidirectional_pathtracing_tpu.core.math import INF_D
from bidirectional_pathtracing_tpu.ops import camera_ops
from bidirectional_pathtracing_tpu.ops.intersect_clustered import (
    intersect_clustered)
from bidirectional_pathtracing_tpu.ops.intersect_pallas import (
    intersect_pallas, make_tri_soa)
from bidirectional_pathtracing_tpu.scene.build import load_scene
from bidirectional_pathtracing_tpu.scene.clusters import build_clusters


def bench(fn, iters=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    upsample = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    w, h = 480, 360
    t0 = time.perf_counter()
    scene, aux = load_scene(
        "/root/reference/dae/sky/CBbunny.dae", w, h,
        mesh_ops=("upsample",) * upsample)
    print(f"loaded: {aux['num_tris']} tris in {time.perf_counter()-t0:.1f}s")
    clusters = scene.clusters   # built host-side by load_scene
    assert clusters is not None, "scene below accel threshold"
    print(f"clusters: C={clusters.n_clusters} blocks={clusters.n_blocks}")

    # primary rays (coherent)
    pix = jnp.arange(w * h)
    x = ((pix % w).astype(jnp.float32) + 0.5) / w
    y = ((pix // w).astype(jnp.float32) + 0.5) / h
    o, d = camera_ops.generate_ray(scene.camera, x, y)
    n = o.shape[0]

    dt, hit_c = bench(lambda: intersect_clustered(
        scene.geometry, clusters, o, d, 1e-3, INF_D))
    print(f"primary clustered: {dt*1e3:8.2f} ms ({n/dt/1e6:6.2f} Mrays/s) "
          f"hits={int(hit_c.valid.sum())}")
    if scene.geometry.num_tris <= 131072:
        soa = make_tri_soa(scene.geometry)
        dt_b, hit_b = bench(lambda: intersect_pallas(
            scene.geometry, soa, o, d, 1e-3, INF_D))
        agree = float(np.mean(np.asarray(hit_b.prim) == np.asarray(hit_c.prim)))
        print(f"primary brute:     {dt_b*1e3:8.2f} ms "
              f"({n/dt_b/1e6:6.2f} Mrays/s) agree={agree:.6f}")

    # bounce-like rays: origins at primary hits, random directions
    key = jax.random.key(0)
    hp = o + hit_c.t[:, None] * d
    hp = jnp.where(hit_c.valid[:, None], hp, 0.0)
    rd = jax.random.normal(key, (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    dt2, hit2 = bench(lambda: intersect_clustered(
        scene.geometry, clusters, hp, rd, 1e-3, INF_D))
    print(f"bounce  clustered: {dt2*1e3:8.2f} ms ({n/dt2/1e6:6.2f} Mrays/s) "
          f"hits={int(hit2.valid.sum())}")
    if scene.geometry.num_tris <= 131072:
        dt2b, hit2b = bench(lambda: intersect_pallas(
            scene.geometry, soa, hp, rd, 1e-3, INF_D))
        agree2 = float(np.mean(np.asarray(hit2b.prim)
                               == np.asarray(hit2.prim)))
        print(f"bounce  brute:     {dt2b*1e3:8.2f} ms "
              f"({n/dt2b/1e6:6.2f} Mrays/s) agree={agree2:.6f}")


if __name__ == "__main__":
    main()
