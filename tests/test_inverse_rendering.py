"""Inverse-rendering examples converge (BASELINE differentiable-render
goals, incl. the environment-light stretch: joint recovery of diffuse
albedos and the envmap emission scale under env-only lighting)."""

import argparse

import pytest


def test_envlight_inverse_recovers_albedo_and_scale():
    from examples.inverse_rendering import run_envlight
    args = argparse.Namespace(steps=150, lr=0.03, size=[40, 30],
                              mode="envlight")
    # run_envlight asserts: albedo error and |log env scale| both halve
    # (measured on this config they drop ~300x, to ~1e-3)
    run_envlight(args)


@pytest.mark.slow
def test_box_inverse_recovers_albedo():
    import sys
    from examples.inverse_rendering import main
    old = sys.argv
    try:
        # the example's documented defaults (60 steps @ 48x36); fewer
        # steps leave the BDPT-noise floor dominating the albedo error
        sys.argv = ["x"]
        main()
    finally:
        sys.argv = old
