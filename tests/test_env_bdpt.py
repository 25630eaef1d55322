"""Environment-light BDPT support (EXTENSION beyond the reference, whose
BDPT asserts on env lights, environment_light.cpp:182-208).

Strategy families (models/bdpt.py env section): primary-miss radiance,
env NEE per non-delta vertex, and — on pure-env scenes — ENV LIGHT
SUBPATHS (envlight.sample_Le emission walks splatted to the camera),
power-2 MIS-weighted against the NEE strategy of each path class.  The
partition is complete, so the converged BDPT render must still agree
with the PT integrator's."""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available


def test_bdpt_env_smoke_fast():
    """Fast-tier coverage: the env-BDPT code path compiles, produces
    finite nonzero radiance on an env-only scene, and stays zero-impact
    when envmap is None."""
    scene = _scene_with_env()
    img = _render(scene, "bdpt", 2, w=20, h=15)
    assert np.isfinite(img).all() and img.mean() > 0.01
    dark = _render(scene._replace(envmap=None), "bdpt", 2, w=20, h=15)
    assert dark.max() == 0.0   # no lights at all -> black


def test_bdpt_env_subpath_splats_fast():
    """Env light subpaths produce finite, nonnegative light-image splats
    on a pure-env scene (the (c) strategy family)."""
    from bidirectional_pathtracing_tpu.config import RenderConfig
    from bidirectional_pathtracing_tpu.utils.render import render
    scene = _scene_with_env()
    res = render(scene, RenderConfig(spp=8, max_ray_depth=4, width=40,
                                     height=30, integrator="bdpt"))
    assert np.isfinite(res.light).all()
    assert (res.light >= 0).all()
    assert res.light.sum() > 0.0



def _scene_with_env():
    from examples.inverse_rendering import _env_image, _open_scene
    from bidirectional_pathtracing_tpu.ops import envlight
    scene = _open_scene()
    return scene._replace(envmap=envlight.build_envmap(_env_image()))


def _render(scene, integrator, spp, w=60, h=45):
    from bidirectional_pathtracing_tpu.config import RenderConfig
    from bidirectional_pathtracing_tpu.utils.render import render
    cfg = RenderConfig(spp=spp, max_ray_depth=4, width=w, height=h,
                       integrator=integrator, light_samples=1)
    return render(scene, cfg).combined


def _blocks(img, nb=6):
    bh, bw = img.shape[0] // nb, img.shape[1] // nb
    return img[:bh * nb, :bw * nb].reshape(nb, bh, nb, bw, 3).mean((1, 3))


@pytest.mark.slow
def test_bdpt_env_matches_pt():
    scene = _scene_with_env()
    bdpt_img = _render(scene, "bdpt", 48)
    pt_img = _render(scene, "pt", 48)
    a, b = _blocks(bdpt_img), _blocks(pt_img)
    err = np.abs(a - b) / (np.abs(b) + 0.05)
    assert err.mean() < 0.05, (err.mean(), err.max())
    assert err.max() < 0.25, err.max()
    # the env actually contributes (scene has no analytic lights)
    assert bdpt_img.mean() > 0.05


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_bdpt_env_with_area_light_still_matches_golden():
    """An env-free scene with the BDPT env code path compiled in must be
    untouched (regression: bunny_unlit golden is PT-only; here we check
    CBspheres_lambertian BDPT against its golden with envmap=None)."""
    from bidirectional_pathtracing_tpu.scene.build import load_scene
    scene, _ = load_scene(
        f"{REFERENCE}/dae/sky/CBspheres_lambertian.dae", 120, 90)
    img = _render(scene, "bdpt", 16, w=120, h=90)
    ref = np.load(
        "tests/golden/cbspheres_lambertian_bdpt_120x90_64spp_d5.npz")
    # combined comparison at matching depth (golden is d5; use d5 here)
    from bidirectional_pathtracing_tpu.config import RenderConfig
    from bidirectional_pathtracing_tpu.utils.render import render
    cfg = RenderConfig(spp=16, max_ray_depth=5, width=120, height=90,
                       integrator="bdpt")
    img = render(scene, cfg).combined
    a, b = _blocks(img, 8), _blocks(ref["combined"], 8)
    err = np.abs(a - b) / (np.abs(b) + 0.05)
    assert err.mean() < 0.03, err.mean()
