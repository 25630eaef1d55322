"""Ablate: eye-image path vs light-image (splat) path vs scatter cost."""
import time
import jax
import jax.numpy as jnp

from bidirectional_pathtracing_tpu.config import RenderConfig
from bidirectional_pathtracing_tpu.scene.build import load_scene
from bidirectional_pathtracing_tpu.models import bdpt

W, H, DEPTH = 480, 360, 5
scene, _ = load_scene("/root/reference/dae/sky/CBspheres.dae", W, H)
scene = jax.device_put(scene)
cfg = RenderConfig(spp=4, max_ray_depth=DEPTH, width=W, height=H,
                   integrator="bdpt")
pixel_ids = jnp.arange(W * H, dtype=jnp.int32)
S = W * H


def timeit(name, fn, n=8):
    key = jax.random.key(0)
    out = fn(key)
    out.block_until_ready()
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(n):
        acc = acc + fn(jax.random.fold_in(key, i))
    acc.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt


@jax.jit
def full_both(key):
    eye_L, light_img = bdpt.sample_pass(scene, key, W, H, pixel_ids, cfg)
    return eye_L.sum() + light_img.sum()


@jax.jit
def eye_only(key):
    eye_L, light_img = bdpt.sample_pass(scene, key, W, H, pixel_ids, cfg)
    return eye_L.sum()


@jax.jit
def light_only(key):
    eye_L, light_img = bdpt.sample_pass(scene, key, W, H, pixel_ids, cfg)
    return light_img.sum()


@jax.jit
def scatter_6x(key):
    img = jnp.zeros((H * W, 3))
    for i in range(6):
        idx = jax.random.randint(jax.random.fold_in(key, i), (S,), 0, H * W)
        val = jax.random.uniform(jax.random.fold_in(key, 100 + i), (S, 3))
        img = img.at[idx].add(val)
    return img.sum()


@jax.jit
def scatter_1x(key):
    img = jnp.zeros((H * W, 3))
    idx = jax.random.randint(key, (6 * S,), 0, H * W)
    val = jax.random.uniform(jax.random.fold_in(key, 1), (6 * S, 3))
    return img.at[idx].add(val).sum()


timeit("full (eye+light)", full_both)
timeit("eye only", eye_only)
timeit("light only", light_only)
timeit("scatter-add 6 x [S] random idx", scatter_6x)
timeit("scatter-add 1 x [6S] random idx", scatter_1x)
