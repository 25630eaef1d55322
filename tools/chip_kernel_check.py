"""On-chip kernel golden check (VERDICT r02 item 8; brute section r05).

Runs the Pallas intersection kernels ON THE REAL TPU against the
exhaustive jnp oracle (ops/intersect.intersect):

  - clustered closest-hit + any-hit on CBbunny geometry with three ray
    populations (camera-coherent, hit-point bounce, segment-clipped
    shadow);
  - the brute kernel on CBspheres geometry (12 tris + 2 spheres),
    exercising the r05 in-kernel sphere tail and the one-hot MXU winner
    resolve (prim ids, mats, interpolated/analytic normals) plus the
    resolve-free any-hit slot test.

Exits nonzero on any mismatch; prints one JSON line with the comparison
counts and writes artifacts/CHIP_KERNEL_CHECK.json.

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

    # --- brute kernel on CBspheres: in-kernel spheres + one-hot resolve ---
    from bidirectional_pathtracing_tpu.ops.intersect_pallas import (
        intersect_pallas, make_sph_soa, make_tri_soa, tri_closest_hit_pallas)
    scene_s, aux_s = load_scene("/root/reference/dae/sky/CBspheres.dae",
                                480, 360)
    geom_s = scene_s.geometry
    tri_soa = make_tri_soa(geom_s)
    cam_s = np.asarray(scene_s.camera.pos)
    tgt = rng.uniform([-1, 0, -1], [1, 2, 1], (n, 3))
    d_cs = tgt - cam_s
    d_cs /= np.linalg.norm(d_cs, axis=-1, keepdims=True)
    o_cs = np.broadcast_to(cam_s, (n, 3)).astype(np.float32)
    brute = {"tris": int(geom_s.num_tris),
             "spheres": int(geom_s.num_spheres), "cases": {}}
    for name, (o, d) in (("camera", (o_cs, d_cs.astype(np.float32))),
                         ("bounce", (o_rnd, d_rnd.astype(np.float32)))):
        o, d = jnp.asarray(o), jnp.asarray(d)
        t0 = time.perf_counter()
        got = jax.block_until_ready(
            intersect_pallas(geom_s, tri_soa, o, d, 1e-4, INF_D))
        dt = time.perf_counter() - t0
        ref = intersect(geom_s, o, d, 1e-4, INF_D)
        ok_valid = bool((np.asarray(got.valid) == np.asarray(ref.valid)).all())
        ok_prim = bool((np.asarray(got.prim) == np.asarray(ref.prim)).all())
        ok_mat = bool((np.asarray(got.mat) == np.asarray(ref.mat)).all())
        # t/n tolerances: the kernel's scalar-chain quadratic and the
        # oracle's jnp.sum reduce in different f32 association orders;
        # on far-origin grazing sphere hits that seeds ~1e-5 relative t
        # drift (measured max 1.2e-5, winners bitwise equal) which the
        # 1/r normal map amplifies to ~2e-4 per component.
        ok_t = bool(np.allclose(np.asarray(got.t), np.asarray(ref.t),
                                rtol=1e-4))
        hv = np.asarray(ref.valid)
        ok_n = bool(np.allclose(np.asarray(got.n)[hv], np.asarray(ref.n)[hv],
                                atol=1e-3))
        brute["cases"][name] = {
            "rays": n, "hits": int(hv.sum()),
            "sphere_hits": int((np.asarray(ref.prim) >= geom_s.num_tris).sum()),
            "valid_equal": ok_valid, "prim_equal": ok_prim,
            "mat_equal": ok_mat, "t_close": ok_t, "n_close": ok_n,
            "first_launch_s": round(dt, 3)}
        rc |= 0 if (ok_valid and ok_prim and ok_mat and ok_t and ok_n) else 1

    # resolve-free any-hit: slot >= 0 against the oracle's windowed hit
    min_b = jnp.full((n,), 1e-3, jnp.float32)
    _, slot = tri_closest_hit_pallas(
        tri_soa, jnp.asarray(o_rnd), jnp.asarray(d_rnd.astype(np.float32)),
        min_b, max_t, sph_soa=make_sph_soa(geom_s), num_tris=geom_s.num_tris)
    got_any = np.asarray(slot) >= 0
    ref_any = np.asarray(occluded(geom_s, jnp.asarray(o_rnd),
                                  jnp.asarray(d_rnd.astype(np.float32)),
                                  1e-3, max_t))
    ok_any = bool((got_any == ref_any).all())
    brute["cases"]["shadow_any_hit"] = {
        "rays": n, "occluded": int(ref_any.sum()), "equal": ok_any}
    rc |= 0 if ok_any else 1
    report["brute"] = brute

    report["ok"] = rc == 0
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/CHIP_KERNEL_CHECK.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return rc


if __name__ == "__main__":
    sys.exit(main())
