"""High-level loaders (reference: agama_helper/_load.py:91,234).

``load_potential``: coef file / HDF5 archive / raw string / dataclass ->
evaluator, with in-memory harmonic filtering and recentering.
``load_evolving_potential``: HDF5 archive of snapshot coefficients (or an
Agama Evolving .ini) -> time-interpolated potential.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .coefs import CylSplineCoefs, MultipoleCoefs, read_coefs
from .cylspline import CylSplinePotential
from .factory import load_potential_ini
from .io import list_coef_groups, read_coef_string
from .modifiers import EvolvingPotential, ShiftedPotential
from .multipole import MultipolePotential

__all__ = ["load_potential", "load_evolving_potential"]


def _wrap_center(pot, center):
    """Recenter: (3,) fixed offset, (T,4)/(T,7) trajectory table, or a
    whitespace table file path."""
    if center is None:
        return pot
    if isinstance(center, (str, Path)):
        center = np.loadtxt(center)
    return ShiftedPotential(pot, np.asarray(center, float))


def _build(coefs, keep_lm_mult=None, keep_m_cylspl=None):
    if isinstance(coefs, MultipoleCoefs):
        if keep_lm_mult is not None:
            coefs = coefs.zeroed(keep_lm_mult)
        return MultipolePotential(coefs)
    if isinstance(coefs, CylSplineCoefs):
        if keep_m_cylspl is not None:
            coefs = coefs.zeroed(keep_m_cylspl)
        return CylSplinePotential(coefs)
    raise TypeError(type(coefs))


def load_potential(source, group_name: str = "snap_000",
                   keep_lm_mult=None, keep_m_cylspl=None, center=None):
    """Build a BFE potential evaluator from any coefficient source.

    source: coef text file path | HDF5 archive path (reads group_name) |
    raw coef string | MultipoleCoefs/CylSplineCoefs.  ``keep_lm_mult`` /
    ``keep_m_cylspl`` filter harmonics before building; ``center`` wraps
    in a ShiftedPotential ((3,), (T,4), (T,7) or a file path).
    """
    if isinstance(source, (MultipoleCoefs, CylSplineCoefs)):
        coefs = source
    else:
        if isinstance(source, (str, Path)) and "\n" not in str(source) \
                and Path(source).suffix.lower() in (".h5", ".hdf5"):
            if not Path(source).exists():
                # falling through to the text parser would report a
                # confusing 'not a valid Agama coef file' for a typo'd
                # archive path
                raise FileNotFoundError(
                    f"coefficient archive not found: {source}")
            source = read_coef_string(source, group_name)
        coefs = read_coefs(source)
    return _wrap_center(_build(coefs, keep_lm_mult, keep_m_cylspl), center)


def load_evolving_potential(source, times=None, keep_lm_mult=None,
                            keep_m_cylspl=None, center=None,
                            interpolate: bool = True):
    """Time-evolving BFE potential from an HDF5 snapshot-coef archive
    (embedded ``times`` dataset or explicit ``times``) or an Agama
    Evolving .ini file."""
    if isinstance(source, (str, Path)) and \
            Path(source).suffix.lower() == ".ini":
        if keep_lm_mult is not None or keep_m_cylspl is not None \
                or times is not None:
            raise ValueError(
                "times/keep_lm_mult/keep_m_cylspl are not supported for "
                ".ini sources (the INI defines its own snapshots); load "
                "the HDF5 archive directly to filter harmonics")
        return _wrap_center(load_potential_ini(source), center)

    groups, t_embedded = list_coef_groups(source)
    if not groups:
        raise ValueError(f"No coefficient groups in {source}")
    if times is None:
        times = t_embedded
    if times is None:
        raise ValueError(
            "archive has no embedded 'times' dataset; pass times="
        )
    if len(times) != len(groups):
        raise ValueError(
            f"{len(groups)} snapshot groups but {len(times)} times"
        )
    # one h5py open for the whole archive (read_coef_string per group
    # would reopen the file N times — slow on network filesystems)
    import h5py

    with h5py.File(source, "r") as f:
        strings = []
        for g in groups:
            raw = f[g]["coefs"][()]
            strings.append(raw.decode() if isinstance(raw, bytes)
                           else str(raw))
    pots = [
        load_potential(s, keep_lm_mult=keep_lm_mult,
                       keep_m_cylspl=keep_m_cylspl)
        for s in strings
    ]
    return _wrap_center(EvolvingPotential(pots, times,
                                          interpolate=interpolate), center)
