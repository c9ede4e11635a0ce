"""Analysis utilities and jittable numerical helpers."""
from .interp import JaxPPoly, spline_coeffs, hermite_coeffs
from .devices import get_device_info, device_alive
from . import main

__all__ = ["JaxPPoly", "spline_coeffs", "hermite_coeffs",
           "get_device_info", "device_alive", "main"]
