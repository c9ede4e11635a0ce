"""Regression tests against the reference's shipped BFE coef fixtures.

The three binary coefficient files are copied verbatim from
/root/reference/nbody_streams/agama_helper/tests/ (data fixtures, not
code; VERDICT round-1 item 3).  Golden phi/force values are frozen from
the round-2 evaluators so any parser or evaluator regression fails
loudly; internal-consistency checks (finite-difference force, Keplerian
far field) guard against 'consistently wrong' drift.

Accuracy context (reference agama_helper/tech_err.md:8-22): monopole
~1e-12 rel, l>0 ~1e-7 phi / ~1e-5 force vs Agama CPU.  Without Agama on
this host the fixtures pin regression, and analytic-profile tests
elsewhere (test_potentials.py, test_galpot.py) pin absolute accuracy.
"""
from pathlib import Path

import numpy as np
import pytest

from nbody_streams_tpu.potentials.coefs import read_coefs
from nbody_streams_tpu.potentials.cylspline import CylSplinePotential
from nbody_streams_tpu.potentials.multipole import MultipolePotential

DATA = Path(__file__).parent / "data"

PTS = np.array([
    [2.0, 0.0, 0.0], [10.0, 5.0, 3.0], [0.5, 0.5, 0.5],
    [50.0, 0.0, 10.0], [0.0, 0.0, 20.0], [-8.0, 3.0, -2.0],
])

GOLDEN = {
    "100.LMC.none_8.coef_mult": {
        "phi": [-33007.10943781, -21969.73359662, -35006.76248579,
                -8800.80405605, -17838.54591934, -24365.97788615],
        "fx": [-1607.41052, -707.367684, -842.876425,
               -126.918290, -28.6996577, 884.734087],
    },
    "600.dark.none_8.coef_mul_DR": {
        "phi": [-124135.86440557, -95467.58629703, -128762.55253354,
                -57880.10717158, -79604.99097467, -101727.79104151],
        "fx": [-4412.19515, -1695.71707, -2049.27976,
               -498.125690, 30.3577542, 2158.55638],
    },
    # refreshed after the |m|=1 axis-derivative fix (r2): an m=1
    # harmonic has nonzero radial slope at R=0, so the lopsided bar now
    # exerts a small transverse force ON the z-axis (fx[4] was clamped
    # to 0 before, which was unphysical for symmetry='none' content)
    "600.bar.none_8.coef_cylsp_DR": {
        "phi": [-119705.53304456, -34803.85697112, -159505.92445731,
                -8277.43564105, -19393.92243715, -44391.15654223],
        "fx": [-3.00015921e+04, -1.99633059e+03, -2.85685852e+04,
               -1.59530471e+02, 1.24757360e+01, 3.78067235e+03],
    },
}


def _load(name):
    coefs = read_coefs(DATA / name)
    return (CylSplinePotential if "cylsp" in name
            else MultipolePotential)(coefs)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_fixture_golden_values(name):
    pot = _load(name)
    gold = GOLDEN[name]
    phi = np.asarray(pot.potential(PTS))
    np.testing.assert_allclose(phi, gold["phi"], rtol=1e-8)
    fx = np.asarray(pot.force(PTS))[:, 0]
    np.testing.assert_allclose(fx, gold["fx"], rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_fixture_force_is_minus_grad_phi(name):
    pot = _load(name)
    h = 1e-4
    for p in PTS[:3]:
        f = np.asarray(pot.force(p[None]))[0]
        fd = np.empty(3)
        for k in range(3):
            dp = np.zeros(3)
            dp[k] = h
            fd[k] = -(float(np.asarray(pot.potential((p + dp)[None]))[0])
                      - float(np.asarray(pot.potential(
                          (p - dp)[None]))[0])) \
                / (2 * h)
        np.testing.assert_allclose(f, fd, rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_fixture_far_field_and_boundary_continuity(name):
    pot = _load(name)
    # -phi*r stays positive and bounded going outward (NFW-like halos
    # legitimately keep growing ~logarithmically — the extrapolated
    # slope is shallower than Keplerian, like Agama's two-term form)
    r = np.array([300.0, 1000.0, 3000.0])
    tp = np.column_stack([r * 0.8, r * 0.36, r * 0.48])
    gm = -np.asarray(pot.potential(tp)) * r
    assert np.all(gm > 0)
    assert gm[2] / gm[1] < 2.0
    # continuity of the continuation across the grid edge
    c = read_coefs(DATA / name)
    r_edge = float(np.asarray(c.R_grid).max())
    lo = np.array([[r_edge * 0.999, 0.0, 0.0]])
    hi = np.array([[r_edge * 1.001, 0.0, 0.0]])
    p_lo = float(np.asarray(pot.potential(lo))[0])
    p_hi = float(np.asarray(pot.potential(hi))[0])
    assert p_hi == pytest.approx(p_lo, rel=5e-3)


def test_fixture_power_spectra():
    # the lossless round-trip the reference documents: parse -> serialise
    # -> parse preserves the tables bit-for-bit
    for name in ("100.LMC.none_8.coef_mult", "600.dark.none_8.coef_mul_DR"):
        c = read_coefs(DATA / name)
        c2 = read_coefs(c.to_coef_string())
        np.testing.assert_array_equal(np.asarray(c.phi), np.asarray(c2.phi))
        assert c2.lm_labels == c.lm_labels
