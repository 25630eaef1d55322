"""Inverse rendering: recover wall albedos by gradient descent.

Demonstrates the differentiable-render path (BASELINE "differentiable
albedo/emission optimization"): render a target Cornell box, perturb the
material table, and recover it by minimising an L2 image loss with Adam —
gradients flow through the BDPT estimator via the detached-sampling rule.

Run:  python examples/inverse_rendering.py [--steps 60]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from bidirectional_pathtracing_tpu.config import RenderConfig
from bidirectional_pathtracing_tpu.models import bdpt
from bidirectional_pathtracing_tpu.scene.procedural import make_cornell_box


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--size", type=int, nargs=2, default=[48, 36])
    args = ap.parse_args()

    w, h = args.size
    cfg = RenderConfig(spp=1, max_ray_depth=3, width=w, height=h,
                       integrator="bdpt")
    scene = make_cornell_box()
    pix = jnp.arange(w * h, dtype=jnp.int32)

    def render_once(albedo, key):
        s = scene._replace(materials=scene.materials._replace(albedo=albedo))
        eye, light = bdpt.sample_pass(s, key, w, h, pix, cfg)
        return eye + light

    target_albedo = scene.materials.albedo
    # only diffuse materials consume albedo; measure recovery there
    diffuse_mask = np.asarray(scene.materials.kind) == 0
    key0 = jax.random.key(123)
    target = jax.jit(render_once)(target_albedo, key0)

    # start from a wrong guess
    guess = jnp.clip(target_albedo + 0.35 * jnp.sin(
        jnp.arange(target_albedo.size, dtype=jnp.float32)
    ).reshape(target_albedo.shape), 0.05, 0.95)

    import optax
    opt = optax.adam(args.lr)
    state = opt.init(guess)

    @jax.jit
    def step(albedo, state, key):
        def loss_fn(a):
            img = render_once(a, key)
            return jnp.mean((img - target) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(albedo)
        upd, state = opt.update(g, state)
        albedo = jnp.clip(albedo + upd, 0.0, 1.0)
        return albedo, state, loss

    def albedo_err(a):
        return float(jnp.abs(a - target_albedo)[diffuse_mask].max())

    err0 = albedo_err(guess)
    t0 = time.time()
    albedo = guess
    for i in range(args.steps):
        albedo, state, loss = step(albedo, state,
                                   jax.random.fold_in(key0, i + 1))
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.5f}  "
                  f"max diffuse albedo err {albedo_err(albedo):.4f}")
    err1 = albedo_err(albedo)
    print(f"done in {time.time() - t0:.1f}s: albedo error {err0:.3f} -> "
          f"{err1:.3f}")
    assert err1 < err0 * 0.5, "optimization failed to converge"


if __name__ == "__main__":
    main()
