"""A/B the cluster-cut split rule on the real chip (r04 VERDICT item #1).

Grid: {CBbunny 28.5k, CBbunny_up1 114k, CBlucy_standin 457k}
    x {midpoint, sah}  (BDPT_TPU_CLUSTER_BUILD)
    x {flat, paired}   (BDPT_TPU_SUBCLUSTERS)

Each cell runs in a fresh subprocess (both knobs are read at import) with
its own AOT dir, timing the exact bench.py dispatch (480x360 d5 spp8
chunk8).  One JSON line per cell; summary table at the end.  Run on a
quiet host.

    python tools/cluster_build_ab.py [cells...]   # cells like CBbunny/sah/flat
"""

import itertools
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

UPS = {"CBbunny": 0, "CBbunny_up1": 1, "CBlucy_standin": 2}

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp
import numpy as np
from bidirectional_pathtracing_tpu.config import RenderConfig
from bidirectional_pathtracing_tpu.scene.build import load_scene
from bidirectional_pathtracing_tpu.utils.render import (
    _bdpt_step_chunk, _trace_cfg)
from bidirectional_pathtracing_tpu.utils import aot

ups = %(ups)d
width, height, depth, spp, chunk = 480, 360, 5, 8, 8
scene, aux = load_scene("/root/reference/dae/sky/CBbunny.dae", width, height,
                        mesh_ops=("upsample",) * ups, mesh_ops_min_tris=1000)
cfg = RenderConfig(spp=spp, max_ray_depth=depth, width=width, height=height,
                   integrator="bdpt")
tcfg = _trace_cfg(cfg)
inv = jnp.float32(1.0 / spp)
key = jax.random.key(0)
t0 = time.perf_counter()
step, aot_hit = aot.get_step(
    _bdpt_step_chunk, "bdpt_step_chunk",
    (scene, key, jnp.int32(0), tcfg, width, height, chunk, inv),
    ((0, 1, 2, 7), f"{tcfg!r}|{width}x{height}|chunk{chunk}"))
eye, light, rays = step(scene, key, jnp.int32(0), inv)
np.asarray(eye)
compile_s = time.perf_counter() - t0
n_chunks = spp // chunk
rays_total = 0.0
t0 = time.perf_counter()
for i in range(n_chunks):
    eye, light, rays = step(scene, key, jnp.int32(i * chunk), inv)
    rays_total += float(rays)
np.asarray(eye), np.asarray(light)
dt = time.perf_counter() - t0
samples = width * height * n_chunks * chunk
print("ABRESULT " + json.dumps({
    "tris": int(aux["num_tris"]), "wall_s": round(dt, 3),
    "compile_s": round(compile_s, 1), "aot_warm": bool(aot_hit),
    "samples_per_s": round(samples / dt, 1),
    "mrays_per_s": round(rays_total / dt / 1e6, 3)}))
"""


def run_cell(name, build, paired):
    env = dict(os.environ,
               BDPT_TPU_CLUSTER_BUILD=build,
               BDPT_TPU_SUBCLUSTERS=str(int(paired)),
               BDPT_TPU_AOT_DIR=f"/tmp/bdpt_aot_cb_{build}_s{int(paired)}")
    p = subprocess.run(
        [sys.executable, "-c", WORKER % dict(repo=REPO, ups=UPS[name])],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3000)
    lines = [l for l in p.stdout.splitlines() if l.startswith("ABRESULT ")]
    if not lines:
        print(f"{name} {build} paired={paired} FAILED:\n{p.stdout[-500:]}"
              f"\n{p.stderr[-1500:]}")
        return None
    r = json.loads(lines[0][len("ABRESULT "):])
    r.update(scene=name, build=build, paired=paired)
    print(json.dumps(r), flush=True)
    return r


def main():
    if len(sys.argv) > 1:
        cells = [tuple(a.split("/")) for a in sys.argv[1:]]
        cells = [(s, b, {"flat": 0, "paired": 1}[l]) for s, b, l in cells]
    else:
        cells = [(s, b, p) for s, b, p in itertools.product(
            UPS, ("midpoint", "sah"), (0, 1))]
    out = [r for c in cells if (r := run_cell(*c))]
    path = os.path.join(REPO, "artifacts", "CLUSTER_BUILD_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    by = {(r["scene"], r["build"], r["paired"]): r["samples_per_s"]
          for r in out}
    for s in UPS:
        for p in (0, 1):
            m, a = by.get((s, "midpoint", p)), by.get((s, "sah", p))
            if m and a:
                print(f"{s:16s} {'paired' if p else 'flat':6s} "
                      f"midpoint={m:9.1f} sah={a:9.1f} "
                      f"sah/midpoint={a / m:.3f}")


if __name__ == "__main__":
    main()
