"""Scaling-efficiency harness: samples/s vs mesh size at fixed total work.

Real multi-chip hardware is not available in this environment, so this
measures what CAN be measured honestly and encodes the method for a pod:

  - virtual-device scaling: the SAME total workload (fixed frame x spp)
    rendered over 1/2/4/8-device CPU meshes in separate processes.  All
    virtual devices share one host's cores, so ideal behavior is FLAT wall
    time; the ratio t_1/t_N isolates the sharding + collective overhead
    the SPMD program adds (psum of the light image, replicated scene) —
    the overhead term that determines pod efficiency.
  - 2-process distributed overhead: the same workload through
    jax.distributed + gloo (tests/test_multiprocess.py topology).

Writes SCALING_r02.json: per-mesh wall seconds, samples/s, and
efficiency = t_best_singledev / t_N (>= 0.9 target per BASELINE).

Usage: python tools/scaling_bench.py [--spp 4] [--size 160 120]
"""

import argparse
import json
import os
import subprocess
import sys
import textwrap

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = textwrap.dedent("""
    import sys, time, json
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(sys.argv[1]))
    sys.path.insert(0, %(repo)r)
    import numpy as np
    from bidirectional_pathtracing_tpu.config import RenderConfig
    from bidirectional_pathtracing_tpu.parallel.render import (
        make_render_mesh, render_step_sharded)
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, w, h, spp = (int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
                    int(sys.argv[4]))
    from bidirectional_pathtracing_tpu.scene.build import load_scene
    scene, _ = load_scene(
        "/root/reference/dae/sky/CBspheres_lambertian.dae", w, h)
    cfg = RenderConfig(spp=spp, max_ray_depth=4, width=w, height=h,
                       integrator="bdpt")
    sp = 2 if n >= 4 else 1
    mesh = make_render_mesh(jax.devices(), sp=sp)
    scene = jax.device_put(scene, NamedSharding(mesh, P()))
    key = jax.random.key(0)
    eye, light = render_step_sharded(scene, key, mesh, cfg, spp)
    np.asarray(eye)  # compile + warmup
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        eye, light = render_step_sharded(
            scene, jax.random.fold_in(key, i), mesh, cfg, spp)
    np.asarray(eye), np.asarray(light)
    dt = (time.perf_counter() - t0) / iters
    print("RESULT " + json.dumps(
        {"devices": n, "mesh": dict(mesh.shape), "wall_s": dt,
         "samples_per_s": w * h * spp / dt}))
""") % dict(repo=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--size", type=int, nargs=2, default=[160, 120])
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r02.json"))
    args = ap.parse_args()
    w, h = args.size

    results = []
    for n in (1, 2, 4, 8):
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        p = subprocess.run(
            [sys.executable, "-c", WORKER, str(n), str(w), str(h),
             str(args.spp)],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=560)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(f"n={n} FAILED:\n{p.stdout[-500:]}\n{p.stderr[-500:]}")
            continue
        r = json.loads(line[0][len("RESULT "):])
        results.append(r)
        print(r)

    if results:
        t1 = results[0]["wall_s"]
        for r in results:
            r["efficiency_vs_1dev"] = round(t1 / r["wall_s"], 3)
        with open(args.out, "w") as f:
            json.dump({
                "workload": f"CBspheres_lambertian {w}x{h} "
                            f"{args.spp}spp d4 BDPT, fixed total work",
                "note": "virtual CPU devices share one host's cores: ideal "
                        "= flat wall time; efficiency isolates SPMD "
                        "sharding/collective overhead",
                "results": results,
            }, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
