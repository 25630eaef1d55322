"""Lean TPU timing: full pass vs subpaths-only vs shadow-batch-only."""
import time
import jax
import jax.numpy as jnp

from bidirectional_pathtracing_tpu.config import RenderConfig
from bidirectional_pathtracing_tpu.scene.build import load_scene
from bidirectional_pathtracing_tpu.models import bdpt
from bidirectional_pathtracing_tpu.core import rng
from bidirectional_pathtracing_tpu.ops import camera_ops, lights as light_ops
from bidirectional_pathtracing_tpu.core.math import EPS_F, INF_D

W, H, DEPTH = 480, 360, 5
scene, _ = load_scene("/root/reference/dae/sky/CBspheres.dae", W, H)
scene = jax.device_put(scene)
cfg = RenderConfig(spp=4, max_ray_depth=DEPTH, width=W, height=H,
                   integrator="bdpt")
pixel_ids = jnp.arange(W * H, dtype=jnp.int32)
S = W * H
NV = DEPTH + 1


def timeit(name, fn, n=6):
    key = jax.random.key(0)
    import numpy as np
    t_c = time.perf_counter()
    out = fn(key); np.asarray(out)
    print(f"{name:30s} compile+1 {time.perf_counter()-t_c:7.1f} s",
          flush=True)
    t0 = time.perf_counter()
    import numpy as np
    for i in range(n):
        out = fn(jax.random.fold_in(key, i))
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:9.2f} ms", flush=True)
    return dt


@jax.jit
def full(key):
    eye_L, li = bdpt.sample_pass(scene, key, W, H, pixel_ids, cfg)
    return eye_L.sum() + li.sum()


def subpaths(key):
    keys = rng.lane_keys(key, pixel_ids)
    px = (pixel_ids % W).astype(jnp.float32)
    py = (pixel_ids // W).astype(jnp.float32)
    u = rng.uniform(rng.fold(keys, 1), (2,))
    o, d = camera_ops.generate_ray(scene.camera, (px + u[:, 0]) / W,
                                   (py + u[:, 1]) / H)
    eye = bdpt._prepare_subpath(scene, o, d, jnp.ones((S,)), jnp.ones((S,)),
                                jnp.ones((S, 3)), d, keys, 10, NV,
                                scene.camera.nclip, scene.camera.fclip)
    nl = light_ops.num_lights(scene.lights)
    lidx = rng.randint(rng.fold(keys, 3), nl)
    le = light_ops.sample_Le(scene.lights, lidx,
                             rng.uniform(rng.fold(keys, 4), (2,)),
                             rng.uniform(rng.fold(keys, 5), (2,)))
    light = bdpt._prepare_subpath(scene, le.o, le.d,
                                  jnp.maximum(le.point_pdf / nl, 1e-12),
                                  le.dir_pdf, le.radiance, le.normal, keys,
                                  40, NV, EPS_F, INF_D)
    return eye, light


@jax.jit
def subpaths_only(key):
    eye, light = subpaths(key)
    return eye.alpha.sum() + light.alpha.sum()


@jax.jit
def subpaths_and_shadows(key):
    eye, light = subpaths(key)
    keys = rng.lane_keys(key, pixel_ids)
    combos = [(i_e, i_l) for i_e in range(1, NV + 1)
              for i_l in range(1, NV + 1)]
    a_all, b_all = [], []
    for (i_e, i_l) in combos:
        a, b = bdpt._connection_endpoints(scene, i_e, i_l, eye, light, keys)
        a_all.append(a)
        b_all.append(b)
    from bidirectional_pathtracing_tpu.ops.intersect import (
        scene_occluded_segment)
    blk, _, _ = scene_occluded_segment(scene, jnp.concatenate(a_all),
                                       jnp.concatenate(b_all))
    return blk.sum() + eye.alpha.sum() + light.alpha.sum()


@jax.jit
def subpaths_shadows_mis(key):
    eye, light = subpaths(key)
    t = bdpt._mis_tables(scene, eye, light)
    tot = eye.alpha.sum() + light.alpha.sum()
    for k in t:
        for i in t[k]:
            tot = tot + t[k][i].sum()
    return tot


print(f"backend: {jax.default_backend()}  S={S}", flush=True)
d_sub = timeit("subpaths_only", subpaths_only)
d_shd = timeit("subpaths_and_shadows", subpaths_and_shadows)
d_mis = timeit("subpaths_mis_tables", subpaths_shadows_mis)
d_full = timeit("full_pass", full)
print(f"connections+mis remainder: {(d_full - d_shd)*1e3:.2f} ms")
