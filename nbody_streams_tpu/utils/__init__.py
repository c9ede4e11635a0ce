"""Analysis utilities and jittable numerical helpers.

The analysis toolkit (profiles, fits, shape, centering, unbinding) is
re-exported at this level to match the reference's
``nbody_streams.utils`` surface (reference: utils/__init__.py).
"""
from .devices import device_alive, get_device_info
from .interp import (JaxPPoly, hermite_coeffs, pchip_coeffs,
                     spline_coeffs)
from . import main
from .main import *  # noqa: F401,F403 (re-export the analysis toolkit)
from .main import __all__ as _main_all

__all__ = ["JaxPPoly", "spline_coeffs", "hermite_coeffs",
           "pchip_coeffs",
           "get_device_info", "device_alive", "main", *_main_all]
