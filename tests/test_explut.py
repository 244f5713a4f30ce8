"""Exp-LUT tests: matches the shader arithmetic and approximates exp(-x)
(reference: src/Utilities/ExpLUT.hpp:10-24, ProceduralGauss.rint:45-54)."""

import jax.numpy as jnp
import numpy as np

from gsrt.ops.explut import build_exp_lut, linear_exp
from gsrt.utils.oracle import exp_lut_np, linear_exp_np


def test_lut_table_matches_oracle():
    np.testing.assert_allclose(np.asarray(build_exp_lut()), exp_lut_np(),
                               rtol=1e-6)


def test_linear_exp_matches_oracle_scalarwise():
    lut = build_exp_lut()
    lut_np = exp_lut_np()
    xs = np.linspace(0.0, 5.6, 777).astype(np.float32)
    got = np.asarray(linear_exp(jnp.asarray(xs), lut))
    want = np.array([linear_exp_np(x, lut_np) for x in xs])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_linear_exp_approximates_exp():
    lut = build_exp_lut()
    xs = np.linspace(0.0, 7.99, 1000).astype(np.float32)
    got = np.asarray(linear_exp(jnp.asarray(xs), lut))
    # first-order LUT with 1/32 spacing: max error ~ e⁻ˣ·(dx²/2) < 5e-4
    np.testing.assert_allclose(got, np.exp(-xs), atol=5e-4)


def test_segment_boundary_exact():
    lut = build_exp_lut()
    xs = np.arange(0, 256) / 32.0
    got = np.asarray(linear_exp(jnp.asarray(xs, jnp.float32), lut))
    np.testing.assert_allclose(got, np.exp(-xs), rtol=2e-5)
