"""Benchmark: BDPT camera samples/sec on CBspheres 480x360 (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference CPU renderer does 480*360*32 spp in 308 s
(report.md:159) ~= 17,953 camera samples/s (each sample = eye+light
subpaths + O(depth^2) connection shadow rays at depth 5).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REF_SAMPLES_PER_S = 480 * 360 * 32 / 308.0


def main():
    from bidirectional_pathtracing_tpu.config import RenderConfig
    from bidirectional_pathtracing_tpu.parallel.render import (
        make_render_mesh, render_step_sharded)
    from jax.sharding import NamedSharding, PartitionSpec as P

    width, height, spp, depth = 480, 360, 32, 5
    scene_path = "/root/reference/dae/sky/CBspheres.dae"
    if os.path.isdir("/root/reference"):
        from bidirectional_pathtracing_tpu.scene.build import load_scene
        scene, _ = load_scene(scene_path, width, height)
    else:
        from bidirectional_pathtracing_tpu.scene.procedural import (
            make_cornell_box)
        scene = make_cornell_box(sphere_materials=("mirror", "glass"))

    cfg = RenderConfig(spp=spp, max_ray_depth=depth, width=width,
                       height=height, integrator="bdpt")
    mesh = make_render_mesh(jax.devices())
    scene = jax.device_put(scene, NamedSharding(mesh, P()))
    key = jax.random.key(0)

    import numpy as np

    # warmup/compile (np.asarray = hard sync: block_until_ready is not a
    # reliable barrier through the axon device tunnel)
    chunk = 4
    eye, light = render_step_sharded(scene, key, mesh, cfg, chunk)
    np.asarray(eye)

    n_chunks = spp // chunk
    t0 = time.perf_counter()
    for i in range(n_chunks):
        eye, light = render_step_sharded(
            scene, jax.random.fold_in(key, i), mesh, cfg, chunk)
    np.asarray(eye), np.asarray(light)
    dt = time.perf_counter() - t0

    samples = width * height * n_chunks * chunk
    sps = samples / dt
    print(json.dumps({
        "metric": "bdpt_camera_samples_per_s_480x360_d5_CBspheres",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / REF_SAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
