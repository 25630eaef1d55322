"""Ablation profile of one BDPT pass on the real TPU."""
import time
import jax
import jax.numpy as jnp

from bidirectional_pathtracing_tpu.config import RenderConfig
from bidirectional_pathtracing_tpu.scene.build import load_scene
from bidirectional_pathtracing_tpu.models import bdpt
from bidirectional_pathtracing_tpu.core import rng
from bidirectional_pathtracing_tpu.ops import camera_ops, lights as light_ops
from bidirectional_pathtracing_tpu.ops.intersect import (
    scene_intersect, scene_occluded_segment)
from bidirectional_pathtracing_tpu.core.math import EPS_F, INF_D

W, H, DEPTH = 480, 360, 5
scene, _ = load_scene("/root/reference/dae/sky/CBspheres.dae", W, H)
cfg = RenderConfig(spp=4, max_ray_depth=DEPTH, width=W, height=H,
                   integrator="bdpt")
pixel_ids = jnp.arange(W * H, dtype=jnp.int32)
key = jax.random.key(0)
S = W * H
NV = DEPTH + 1


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return dt


@jax.jit
def full(scene, key):
    return bdpt.sample_pass(scene, key, W, H, pixel_ids, cfg)


def make_subpaths(scene, key):
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
    point_pdf = le.point_pdf / nl
    light = bdpt._prepare_subpath(scene, le.o, le.d,
                                  jnp.maximum(point_pdf, 1e-12), le.dir_pdf,
                                  le.radiance, le.normal, keys, 40, NV,
                                  EPS_F, INF_D)
    return eye, light, keys


@jax.jit
def walks_only(scene, key):
    eye, light, _ = make_subpaths(scene, key)
    return eye.pos.sum() + light.pos.sum()


@jax.jit
def walks_occl(scene, key):
    eye, light, keys = make_subpaths(scene, key)
    combos = [(i_e, i_l) for i_e in range(1, NV + 1)
              for i_l in range(1, NV + 1)]
    a_all, b_all = [], []
    for (i_e, i_l) in combos:
        a, b = bdpt._connection_endpoints(scene, i_e, i_l, eye, light, keys)
        a_all.append(a)
        b_all.append(b)
    blk, _, _ = scene_occluded_segment(scene, jnp.concatenate(a_all),
                                       jnp.concatenate(b_all))
    return blk.sum() + eye.pos.sum() + light.pos.sum()


@jax.jit
def walks_occl_tables(scene, key):
    eye, light, keys = make_subpaths(scene, key)
    combos = [(i_e, i_l) for i_e in range(1, NV + 1)
              for i_l in range(1, NV + 1)]
    a_all, b_all = [], []
    for (i_e, i_l) in combos:
        a, b = bdpt._connection_endpoints(scene, i_e, i_l, eye, light, keys)
        a_all.append(a)
        b_all.append(b)
    blk, _, _ = scene_occluded_segment(scene, jnp.concatenate(a_all),
                                       jnp.concatenate(b_all))
    t = bdpt._mis_tables(scene, eye, light)
    acc = blk.sum() + eye.pos.sum()
    for dct in t.values():
        for v in dct.values():
            acc = acc + v.sum()
    return acc


@jax.jit
def intersect_1M(scene, o, d):
    return scene_intersect(scene, o, d, EPS_F, INF_D).t.sum()


print(f"tris={scene.geometry.num_tris} spheres={scene.geometry.num_spheres}")
t_full = timeit("full sample_pass", full, scene, key)
t_w = timeit("walks only", walks_only, scene, key)
t_wo = timeit("walks + occlusion", walks_occl, scene, key)
t_wot = timeit("walks + occl + mis tables", walks_occl_tables, scene, key)
o = jnp.zeros((36 * S, 3)) + jnp.array([0.0, 1.0, 2.0])
d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (36 * S, 1))
timeit("raw closest-hit 6.2M rays", intersect_1M, scene, o, d)
print(f"connections+MIS remainder: {(t_full - t_wot)*1e3:.2f} ms")
