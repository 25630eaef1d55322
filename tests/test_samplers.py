"""Sampler pdf-consistency tests (the Sampler3D::pdf contract the reference
defines for BDPT MIS, reference src/pathtracer/sampler.h:68-69)."""

import jax
import jax.numpy as jnp
import numpy as np

from bidirectional_pathtracing_tpu.core import samplers


def _mc_integral(sample_fn, pdf_fn, f, n=200_000, seed=0):
    key = jax.random.key(seed)
    v = sample_fn(key, (n,))
    pdf = pdf_fn(v)
    vals = f(v) / jnp.maximum(pdf, 1e-12)
    return float(jnp.mean(vals))


def test_uniform_sphere_pdf_normalises():
    est = _mc_integral(samplers.uniform_sphere, samplers.uniform_sphere_pdf,
                       lambda v: jnp.ones(v.shape[:-1]))
    assert abs(est - 4 * np.pi) < 0.05


def test_uniform_hemisphere_pdf_normalises():
    est = _mc_integral(samplers.uniform_hemisphere,
                       samplers.uniform_hemisphere_pdf,
                       lambda v: jnp.ones(v.shape[:-1]))
    assert abs(est - 2 * np.pi) < 0.05


def test_cosine_hemisphere_matches_pdf():
    key = jax.random.key(1)
    wi, pdf = samplers.cosine_hemisphere(key, (100_000,))
    # returned pdf equals the closed form z/pi
    np.testing.assert_allclose(np.asarray(pdf),
                               np.asarray(samplers.cosine_hemisphere_pdf(wi)),
                               rtol=1e-5, atol=1e-6)
    # cosine integral: E[cos/pdf] = integral of cos over hemisphere = pi
    est = float(jnp.mean(wi[..., 2] / jnp.maximum(pdf, 1e-12)))
    assert abs(est - np.pi) < 0.05


def test_samples_on_unit_sphere():
    key = jax.random.key(2)
    for fn in (samplers.uniform_sphere, samplers.uniform_hemisphere):
        v = fn(key, (1000,))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1),
                                   1.0, atol=1e-5)


def test_deterministic_given_key():
    key = jax.random.key(3)
    a = samplers.cosine_hemisphere(key, (64,))[0]
    b = samplers.cosine_hemisphere(key, (64,))[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
