"""Analysis utilities and jittable numerical helpers."""
from .interp import JaxPPoly, spline_coeffs, hermite_coeffs

__all__ = ["JaxPPoly", "spline_coeffs", "hermite_coeffs"]
