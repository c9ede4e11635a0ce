"""FIRE-simulation convenience helpers (reference: agama_helper/_fire.py).

Utilities for working with FIRE-style snapshot time listings and
batched per-snapshot coefficient files.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = [
    "read_snapshot_times",
    "create_evolving_ini",
    "create_fire_evolving_ini",
]


def read_snapshot_times(path) -> dict:
    """Parse a FIRE ``snapshot_times.txt`` robustly.

    Returns {'index', 'scale_factor', 'redshift', 'time', 'lookback'}
    arrays (missing columns filled with NaN).  Handles comment headers
    and variable column counts (reference: _fire.py:29).
    """
    path = Path(path)
    rows = []
    for line in path.read_text().splitlines():
        s = line.strip()
        if not s or s.startswith(("#", ";", "//")):
            continue
        parts = s.replace(",", " ").split()
        try:
            rows.append([float(p) for p in parts])
        except ValueError:
            continue
    if not rows:
        raise ValueError(f"no numeric rows found in {path}")
    width = max(len(r) for r in rows)
    arr = np.full((len(rows), width), np.nan)
    for i, r in enumerate(rows):
        arr[i, :len(r)] = r
    names = ["index", "scale_factor", "redshift", "time", "lookback"]
    out = {}
    for j, name in enumerate(names):
        out[name] = arr[:, j] if j < width else np.full(len(rows), np.nan)
    out["index"] = out["index"].astype(int)
    return out


def create_evolving_ini(filename, coef_files, times,
                        interp_linear: bool = True) -> Path:
    """Write an Agama-style ``type=Evolving`` INI with a Timestamps block
    (readable by :func:`..factory.load_potential_ini` and by Agama)."""
    filename = Path(filename)
    if len(coef_files) != len(times):
        raise ValueError(
            f"{len(coef_files)} files but {len(times)} times")
    lines = [
        "[Potential]",
        "type=Evolving",
        f"interpLinear={'True' if interp_linear else 'False'}",
        "Timestamps",
    ]
    for t, f in zip(times, coef_files):
        lines.append(f"{t:.10g} {f}")
    filename.write_text("\n".join(lines) + "\n")
    return filename


def create_fire_evolving_ini(sim_dir, snapshots, filename=None,
                             pattern: str = "{snap}.coef_mult",
                             times=None, snapshot_times="snapshot_times.txt",
                             interp_linear: bool = True) -> Path:
    """Build an evolving-potential INI for a series of FIRE snapshots.

    ``pattern`` is formatted with ``snap``; times default to the physical
    times from the snapshot_times listing (reference: _fire.py:191).
    """
    import os

    sim_dir = Path(sim_dir)
    if times is None:
        listing = read_snapshot_times(sim_dir / snapshot_times)
        tmap = dict(zip(listing["index"], listing["time"]))
        missing = [s for s in snapshots if s not in tmap]
        if missing:
            raise ValueError(f"snapshots missing from times file: {missing}")
        times = [tmap[s] for s in snapshots]
    if not np.all(np.isfinite(np.asarray(times, float))):
        raise ValueError(
            f"non-finite snapshot times {times}: the snapshot_times "
            "listing has no physical-time column (NaN timestamps would "
            "make every Timestamps bracket comparison false)")
    filename = Path(filename) if filename is not None \
        else (sim_dir / "evolving_potential.ini")
    # Timestamps paths resolve relative to the INI's own directory
    # (load_potential_ini semantics) — prefix accordingly when the INI
    # is written outside sim_dir
    rel = os.path.relpath(sim_dir, filename.parent)
    prefix = "" if rel == "." else rel + "/"
    files = [prefix + pattern.format(snap=s) for s in snapshots]
    return create_evolving_ini(filename, files, times,
                               interp_linear=interp_linear)
