"""Flagship parity renders: 480x360 @ 128spp BDPT on the chip, compared
block-by-block against the reference's committed goldens
(/root/reference/assets/CB{spheres,gems}_bdpt_128.png, README.md:5-9).

    python tools/flagship_render.py [scene ...]   # default: spheres gems

Writes artifacts/CB<scene>_bdpt_128.png (+ _eye/_light) and
artifacts/FLAGSHIP.json with wall time, measured Mrays/s, and the 8x8
block error vs the reference PNG in tonemapped sRGB space.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

SCENES = {
    "spheres": ("CBspheres", 5),
    "gems": ("CBgems", 8),
}


def block_err(a, b, nb=8, floor=8.0):
    """Mean abs block error between two uint8 [H,W,3] images, relative."""
    bh, bw = a.shape[0] // nb, a.shape[1] // nb
    ba = a[:bh * nb, :bw * nb].reshape(nb, bh, nb, bw, 3).astype(
        np.float64).mean((1, 3))
    bb = b[:bh * nb, :bw * nb].reshape(nb, bh, nb, bw, 3).astype(
        np.float64).mean((1, 3))
    return np.abs(ba - bb) / (bb + floor)


def main():
    names = sys.argv[1:] or ["spheres", "gems"]
    os.makedirs("artifacts", exist_ok=True)

    from bidirectional_pathtracing_tpu.config import RenderConfig
    from bidirectional_pathtracing_tpu.scene.build import load_scene
    from bidirectional_pathtracing_tpu.utils import image as img
    from bidirectional_pathtracing_tpu.utils.png import read_png
    from bidirectional_pathtracing_tpu.utils.render import render

    results = {}
    for name in names:
        scene_name, depth = SCENES[name]
        scene, aux = load_scene(
            f"/root/reference/dae/sky/{scene_name}.dae", 480, 360)
        cfg = RenderConfig(spp=128, max_ray_depth=depth, width=480,
                           height=360, integrator="bdpt",
                           samples_per_chunk=4)
        t0 = time.perf_counter()
        res = render(scene, cfg)
        out = f"artifacts/{scene_name}_bdpt_128.png"
        img.save_image(out, res.combined)
        img.save_image(out[:-4] + "_eye.png", res.eye)
        img.save_image(out[:-4] + "_light.png", res.light)

        mine = read_png(out)[..., :3]
        ref = read_png(
            f"/root/reference/assets/{scene_name}_bdpt_128.png")[..., :3]
        e = block_err(mine, ref)
        results[scene_name] = {
            "wall_time_s": round(res.stats["wall_time_s"], 1),
            "samples_per_s": round(res.stats["camera_samples_per_s"], 1),
            "mrays_per_s": round(res.stats["mrays_per_s"], 3),
            "rays_per_sample": round(res.stats["rays_per_sample"], 2),
            "block_err_mean": round(float(e.mean()), 4),
            "block_err_max": round(float(e.max()), 4),
            "tris": aux["num_tris"],
        }
        print(scene_name, results[scene_name], flush=True)

    with open("artifacts/FLAGSHIP.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
