"""A/B the paired sub-cluster kernel layout on the real chip (r03 VERDICT
item #4).

Runs the bench.py measurement (same dispatch, same shapes) for CBbunny
and CBlucy_standin with BDPT_TPU_SUBCLUSTERS=0 and =1 in separate
subprocesses (the knob is read at import), printing one JSON line per
cell.  Run on a quiet host — dispatch jitter on the 2-core machine
pollutes wall_s.

    python tools/subcluster_ab.py [CBbunny|CBlucy_standin] ...
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.argv = ["bench.py"]
import bench
name = %(name)r
path = "/root/reference/dae/sky/CBbunny.dae"
depth, spp, chunk = 5, 8, 8
res = bench.bench_scene(name, path, depth, spp, chunk)
print("ABRESULT " + json.dumps(res))
"""


def run_cell(name, paired):
    env = dict(os.environ, BDPT_TPU_SUBCLUSTERS=str(int(paired)))
    # paired executables must not collide with flat ones in the AOT store
    env["BDPT_TPU_AOT_DIR"] = f"/tmp/bdpt_aot_sub{int(paired)}"
    p = subprocess.run(
        [sys.executable, "-c", WORKER % dict(repo=REPO, name=name)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3000)
    lines = [l for l in p.stdout.splitlines() if l.startswith("ABRESULT ")]
    if not lines:
        print(f"{name} paired={paired} FAILED:\n{p.stdout[-500:]}"
              f"\n{p.stderr[-1500:]}")
        return None
    r = json.loads(lines[0][len("ABRESULT "):])
    r["paired"] = paired
    print(json.dumps(r), flush=True)
    return r


def main():
    scenes = sys.argv[1:] or ["CBbunny", "CBlucy_standin"]
    out = []
    for name in scenes:
        for paired in (0, 1):
            r = run_cell(name, paired)
            if r:
                out.append(r)
    with open(os.path.join(REPO, "artifacts", "SUBCLUSTER_AB.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
