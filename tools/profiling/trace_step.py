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

    import jax.numpy as jnp

    from bidirectional_pathtracing_tpu.config import RenderConfig
    from bidirectional_pathtracing_tpu.scene.build import load_scene
    from bidirectional_pathtracing_tpu.utils.render import (
        _bdpt_step_chunk, _trace_cfg)

    try:   # reuse bench.py's compiled step (same tcfg + operand signature)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    w, h = 480, 360
    scene, aux = load_scene(scene_path, w, h)
    cfg = RenderConfig(spp=8, max_ray_depth=5, width=w, height=h,
                       integrator="bdpt")
    tcfg = _trace_cfg(cfg)
    inv = jnp.float32(1.0 / cfg.spp)
    key = jax.random.key(0)
    eye, light, rays = _bdpt_step_chunk(scene, key, jnp.int32(0), tcfg,
                                        w, h, 8, inv)
    np.asarray(eye)  # compile

    with jax.profiler.trace(out):
        eye, light, rays = _bdpt_step_chunk(scene, key, jnp.int32(0), tcfg,
                                            w, h, 8, inv)
        np.asarray(eye)
    print(f"trace written to {out} ({aux['num_tris']} tris, "
          f"8 passes in one chunk)")


if __name__ == "__main__":
    main()
