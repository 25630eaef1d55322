"""On-chip clustered-kernel golden check (VERDICT r02 item 8).

Runs the clustered closest-hit and any-hit Pallas kernels ON THE REAL TPU
against the exhaustive jnp oracle (ops/intersect.intersect) for CBbunny
geometry with three ray populations (camera-coherent, hit-point bounce,
segment-clipped shadow).  Exits nonzero on any mismatch; prints one JSON
line with the comparison counts and writes artifacts/CHIP_KERNEL_CHECK.json.

Driven by tests/test_chip.py (subprocess, so the pytest process can keep
its forced-CPU backend) and run standalone in the bench environment:

    python tools/chip_kernel_check.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(json.dumps({"skipped": f"no TPU (backend={backend})"}))
        return 0

    from bidirectional_pathtracing_tpu.core.math import INF_D
    from bidirectional_pathtracing_tpu.ops.intersect import intersect
    from bidirectional_pathtracing_tpu.ops.intersect_clustered import (
        intersect_clustered, occluded_clustered)
    from bidirectional_pathtracing_tpu.ops.intersect import occluded
    from bidirectional_pathtracing_tpu.scene.build import load_scene
    from bidirectional_pathtracing_tpu.scene.clusters import build_clusters

    scene, aux = load_scene("/root/reference/dae/sky/CBbunny.dae", 480, 360)
    geom = scene.geometry
    clusters = scene.clusters
    if clusters is None:
        clusters = build_clusters(geom)

    rng = np.random.default_rng(0)
    n = 4096
    # camera-style rays from the camera position through the scene
    cam = np.asarray(scene.camera.pos)
    tgt = rng.uniform([-1, 0, -1], [1, 2, 1], (n, 3))
    d_cam = tgt - cam
    d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
    o_cam = np.broadcast_to(cam, (n, 3)).astype(np.float32)
    # incoherent bounce-style rays: random origins in the box, random dirs
    o_rnd = rng.uniform([-1, 0, -1], [1, 2, 1], (n, 3)).astype(np.float32)
    d_rnd = rng.normal(0, 1, (n, 3))
    d_rnd /= np.linalg.norm(d_rnd, axis=-1, keepdims=True)

    report = {"backend": backend, "tris": int(aux["num_tris"]), "cases": {}}
    rc = 0
    for name, (o, d) in (("camera", (o_cam, d_cam.astype(np.float32))),
                         ("bounce", (o_rnd, d_rnd.astype(np.float32)))):
        o, d = jnp.asarray(o), jnp.asarray(d)
        t0 = time.perf_counter()
        got = jax.block_until_ready(
            intersect_clustered(geom, clusters, o, d, 1e-4, INF_D))
        dt = time.perf_counter() - t0
        ref = intersect(geom, o, d, 1e-4, INF_D)
        ok_valid = bool((np.asarray(got.valid) == np.asarray(ref.valid)).all())
        ok_prim = bool((np.asarray(got.prim) == np.asarray(ref.prim)).all())
        ok_t = bool(np.allclose(np.asarray(got.t), np.asarray(ref.t),
                                rtol=1e-6))
        report["cases"][name] = {
            "rays": n, "hits": int(np.asarray(ref.valid).sum()),
            "valid_equal": ok_valid, "prim_equal": ok_prim,
            "t_close": ok_t, "first_launch_s": round(dt, 3)}
        rc |= 0 if (ok_valid and ok_prim and ok_t) else 1

    # shadow-segment any-hit
    max_t = jnp.asarray(rng.uniform(0.5, 4.0, (n,)).astype(np.float32))
    got_any = occluded_clustered(geom, clusters, jnp.asarray(o_rnd),
                                 jnp.asarray(d_rnd.astype(np.float32)),
                                 1e-3, max_t)
    ref_any = occluded(geom, jnp.asarray(o_rnd),
                       jnp.asarray(d_rnd.astype(np.float32)), 1e-3, max_t)
    ok_any = bool((np.asarray(got_any) == np.asarray(ref_any)).all())
    report["cases"]["shadow_any_hit"] = {
        "rays": n, "occluded": int(np.asarray(ref_any).sum()),
        "equal": ok_any}
    rc |= 0 if ok_any else 1

    report["ok"] = rc == 0
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/CHIP_KERNEL_CHECK.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return rc


if __name__ == "__main__":
    sys.exit(main())
