"""Native HEALPix ring-scheme pixelisation and the HEALPix-backed
Mollweide renderer (reference: viz/plots.py:433-617, via healpy)."""
import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from nbody_streams_tpu.viz.healpix import (
    ang2pix_ring,
    healpix_map,
    nside2npix,
    pix2ang_ring,
    vec2pix_ring,
)
from nbody_streams_tpu.viz import plot_mollweide


@pytest.mark.parametrize("nside", [1, 2, 8, 64, 256])
def test_pix2ang_ang2pix_roundtrip(nside):
    npix = nside2npix(nside)
    pix = np.arange(npix)
    th, ph = pix2ang_ring(nside, pix)
    assert ((0 <= th) & (th <= np.pi)).all()
    assert ((0 <= ph) & (ph < 2 * np.pi)).all()
    np.testing.assert_array_equal(ang2pix_ring(nside, th, ph), pix)


def test_equal_area_property():
    """Uniform directions give Poisson-consistent equal pixel counts."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=(400000, 3))
    m = healpix_map(16, v)
    assert m.sum() == 400000
    # relative scatter matches Poisson sqrt(1/mean) within 20%
    assert m.std() / m.mean() == pytest.approx(
        np.sqrt(1.0 / m.mean()), rel=0.2)


def test_poles_and_equator():
    # north pole lands in the first ring, south pole in the last
    assert ang2pix_ring(8, np.array([1e-12]), np.array([0.3]))[0] < 4
    assert ang2pix_ring(8, np.array([np.pi - 1e-12]),
                        np.array([0.3]))[0] >= nside2npix(8) - 4
    # equator pixels are in the equatorial belt
    ncap = 2 * 8 * 7
    p = ang2pix_ring(8, np.array([np.pi / 2]), np.array([1.0]))[0]
    assert ncap <= p < nside2npix(8) - ncap


def test_vec2pix_matches_ang2pix():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(1000, 3))
    r = np.linalg.norm(v, axis=1)
    th = np.arccos(v[:, 2] / r)
    ph = np.mod(np.arctan2(v[:, 1], v[:, 0]), 2 * np.pi)
    np.testing.assert_array_equal(vec2pix_ring(32, v),
                                  ang2pix_ring(32, th, ph))


class TestMollweide:
    def test_basic_map(self):
        rng = np.random.default_rng(2)
        pos = rng.normal(size=(5000, 3))
        ax, sky = plot_mollweide(pos)
        assert sky.shape == (nside2npix(60),)
        assert np.isfinite(sky).all()
        plt.close("all")

    def test_dynamic_nside_and_weights(self):
        rng = np.random.default_rng(3)
        pos = rng.normal(size=(200000, 3))
        w = rng.uniform(0.5, 2.0, 200000)
        ax, sky = plot_mollweide(pos, weights=w, density_threshold=1e4)
        # nside upscaled: min(512, 60*sqrt(20)) = 268
        assert sky.shape == (nside2npix(min(512, int(60 * np.sqrt(20)))),)
        plt.close("all")

    def test_shell_filter_and_traj(self):
        rng = np.random.default_rng(4)
        pos = rng.normal(size=(20000, 3)) * 30
        traj = np.column_stack([np.cos(np.linspace(0, 3, 50)),
                                np.sin(np.linspace(0, 3, 50)),
                                np.zeros(50)]) * 40
        ax, sky = plot_mollweide(pos, filter_radius=(30.0, 10.0),
                                 add_traj=traj, add_end_pt=True,
                                 normalize=True, log_scale=False)
        assert np.isfinite(sky).all()
        plt.close("all")

    def test_smoothing_conserves_signal_location(self):
        """A point source smoothed by a few degrees stays put."""
        v = np.array([[1.0, 0.0, 0.0]] * 200)
        ax, sky = plot_mollweide(v, smooth_fwhm_deg=5.0, log_scale=False)
        th, ph = pix2ang_ring(60, np.array([int(np.argmax(sky))]))
        assert abs(th[0] - np.pi / 2) < 0.1       # on the equator
        assert min(ph[0], 2 * np.pi - ph[0]) < 0.1  # at phi ~ 0
        plt.close("all")


def test_mixed_scalar_array_broadcast():
    """healpy broadcasts mixed scalar/array theta, phi (r2 review)."""
    th = np.array([0.1, 1.0, 3.0])
    p1 = ang2pix_ring(4, th, 0.0)
    p2 = ang2pix_ring(4, th, np.zeros(3))
    np.testing.assert_array_equal(p1, p2)
    ph = np.array([0.0, 1.0, 2.0])
    p3 = ang2pix_ring(4, 0.1, ph)
    p4 = ang2pix_ring(4, np.full(3, 0.1), ph)
    np.testing.assert_array_equal(p3, p4)

    def test_faint_log_map_background_not_brightest(self):
        """Filled pixels with density < 1/deg^2 go negative in log10;
        empty background must land BELOW them, not at 0.0 (which would
        render as the brightest value and invert the map)."""
        rng = np.random.default_rng(7)
        pos = rng.normal(size=(300, 3))           # sparse: faint pixels
        w = np.full(300, 1e-3)
        ax, sky = plot_mollweide(pos, weights=w)
        assert sky.max() > sky.min()
        # the brightest pixel is a FILLED one (signal), not background
        assert np.isfinite(sky).all()
        filled_floor = sky.min()
        assert sky.max() > filled_floor
        plt.close("all")

    def test_faint_log_map_normalize_no_inversion(self):
        """normalize on a log map subtracts the median (dividing by a
        negative log-median flipped bright and dark)."""
        rng = np.random.default_rng(8)
        pos = rng.normal(size=(500, 3))
        ax, sky = plot_mollweide(pos, weights=np.full(500, 1e-3),
                                 normalize=True)
        # median of the normalised map should be ~0 on filled pixels
        assert np.isfinite(sky).all()
        plt.close("all")

    def test_zero_vector_raises(self):
        pos = np.array([[1.0, 0, 0], [0.0, 0.0, 0.0]])
        with pytest.raises(ValueError, match="zero-length"):
            vec2pix_ring(16, pos)
