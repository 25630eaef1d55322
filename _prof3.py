import time
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bidirectional_pathtracing_tpu.config import RenderConfig
from bidirectional_pathtracing_tpu.scene.build import load_scene
from bidirectional_pathtracing_tpu.parallel.render import (
    make_render_mesh, render_step_sharded)

W, H = 480, 360
scene, _ = load_scene("/root/reference/dae/sky/CBspheres.dae", W, H)
cfg = RenderConfig(spp=32, max_ray_depth=5, width=W, height=H,
                   integrator="bdpt")
mesh = make_render_mesh(jax.devices())
scene_dev = jax.device_put(scene, NamedSharding(mesh, P()))
key = jax.random.key(0)

for chunk in (1, 4, 8):
    eye, light = render_step_sharded(scene_dev, key, mesh, cfg, chunk)
    jax.block_until_ready((eye, light))
    n = max(1, 16 // chunk)
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n):
        eye, light = render_step_sharded(scene_dev,
                                         jax.random.fold_in(key, i),
                                         mesh, cfg, chunk)
        acc = acc + eye.sum()          # data dependency on every step
    acc.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"chunk={chunk}: {dt*1e3:8.2f} ms/step -> "
          f"{W*H*chunk/dt/1e6:.2f} Msamples/s   (acc={float(acc):.3f})")

# per-call blocking (includes full tunnel latency each call)
for chunk in (1, 4):
    n = max(1, 8 // chunk)
    t0 = time.perf_counter()
    for i in range(n):
        out = render_step_sharded(scene_dev, jax.random.fold_in(key, 100 + i),
                                  mesh, cfg, chunk)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"chunk={chunk} blocking: {dt*1e3:8.2f} ms/step")
