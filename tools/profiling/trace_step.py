"""Capture a jax.profiler trace of one BDPT sample pass on the chip.

    python tools/profiling/trace_step.py [scene.dae] [out_dir]

Writes a TensorBoard-compatible trace under artifacts/trace/ — the
profiler artifact backing the BENCH notes (VERDICT round-1 item 2).
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def main():
    scene_path = (sys.argv[1] if len(sys.argv) > 1
                  else "/root/reference/dae/sky/CBbunny.dae")
    out = sys.argv[2] if len(sys.argv) > 2 else "artifacts/trace"

    from bidirectional_pathtracing_tpu.config import RenderConfig
    from bidirectional_pathtracing_tpu.scene.build import load_scene
    from bidirectional_pathtracing_tpu.utils.render import _bdpt_step

    w, h = 480, 360
    scene, aux = load_scene(scene_path, w, h)
    cfg = RenderConfig(spp=1, max_ray_depth=5, width=w, height=h,
                       integrator="bdpt")
    key = jax.random.key(0)
    eye, light, rays = _bdpt_step(scene, key, cfg, w, h)
    np.asarray(eye)  # compile

    with jax.profiler.trace(out):
        for i in range(3):
            eye, light, rays = _bdpt_step(
                scene, jax.random.fold_in(key, i), cfg, w, h)
        np.asarray(eye)
    print(f"trace written to {out} ({aux['num_tris']} tris)")


if __name__ == "__main__":
    main()
