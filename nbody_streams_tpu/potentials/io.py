"""HDF5 coefficient archives (reference: agama_helper/_io.py).

One Agama coefficient text string per HDF5 group — the batch format used
for evolving potentials, with an optional embedded ``times`` dataset.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

__all__ = [
    "write_coef_to_h5",
    "write_snapshot_coefs_to_h5",
    "read_coef_string",
    "list_coef_groups",
]


def _require_h5py():
    if h5py is None:
        raise ImportError(
            "h5py is required for coefficient archives "
            "(pip install h5py)")


def write_coef_to_h5(h5_path, coef_string: str,
                     group_name: str = "snap_000",
                     dataset_name: str = "coefs",
                     overwrite: bool = False,
                     metadata: dict | None = None) -> None:
    """Store one coefficient string under ``group_name/dataset_name``."""
    _require_h5py()
    h5_path = Path(h5_path)
    dt = h5py.string_dtype(encoding="utf-8")
    with h5py.File(h5_path, "a") as f:
        grp = f.require_group(group_name)
        if dataset_name in grp:
            if not overwrite:
                raise RuntimeError(
                    f"{group_name}/{dataset_name} exists; pass "
                    "overwrite=True to replace"
                )
            del grp[dataset_name]
        grp.create_dataset(dataset_name, data=coef_string, dtype=dt)
        for k, v in (metadata or {}).items():
            grp.attrs[k] = v


def write_snapshot_coefs_to_h5(h5_path, coef_strings, times=None,
                               group_fmt: str = "snap_{snap:03d}",
                               dataset_name: str = "coefs",
                               overwrite: bool = True) -> None:
    """Batch-pack snapshot coefficient strings (+ optional times dataset).

    With ``overwrite=True`` (default) any OTHER ``group_fmt``-matching
    snapshot groups already in the file are deleted first: re-packing an
    archive with fewer snapshots must not leave stale snap_* groups
    behind (they would desync from the ``times`` dataset and break
    ``load_evolving_potential``'s groups/times pairing).
    """
    _require_h5py()
    h5_path = Path(h5_path)
    coef_strings = list(coef_strings)
    if overwrite and h5_path.exists():
        import re as _re

        pat = _re.compile(
            "^" + _re.escape(group_fmt).replace(
                _re.escape("{snap:03d}"), r"\d+").replace(
                _re.escape("{snap}"), r"\d+") + "$")
        with h5py.File(h5_path, "a") as f:
            for k in [k for k in f.keys()
                      if isinstance(f[k], h5py.Group) and pat.match(k)]:
                del f[k]
    for i, s in enumerate(coef_strings):
        write_coef_to_h5(h5_path, s, group_fmt.format(snap=i),
                         dataset_name, overwrite=overwrite)
    with h5py.File(h5_path, "a") as f:
        # always drop a stale 'times' dataset: re-packing with times=None
        # must not leave old epochs paired with the new coefficients
        # (load_evolving_potential's length check cannot catch that)
        if "times" in f:
            del f["times"]
        if times is not None:
            f.create_dataset("times", data=np.asarray(times, float))


def read_coef_string(h5_path, group_name: str = "snap_000",
                     dataset_name: str = "coefs") -> str:
    """Fetch one stored coefficient string."""
    _require_h5py()
    with h5py.File(h5_path, "r") as f:
        raw = f[group_name][dataset_name][()]
    return raw.decode() if isinstance(raw, bytes) else str(raw)


def list_coef_groups(h5_path, dataset_name: str = "coefs"):
    """(group_names, times or None) for the archive's snapshot groups.

    Sorted numerically by trailing index (snap_999 < snap_1000) so the
    order always matches the embedded ``times`` dataset — plain
    lexicographic sorting breaks past 3-digit archives.
    """
    import re as _re

    _require_h5py()

    def key(name):
        m = _re.search(r"(\d+)$", name)
        return (int(m.group(1)) if m else -1, name)

    with h5py.File(h5_path, "r") as f:
        groups = sorted(
            (k for k in f.keys()
             if isinstance(f[k], h5py.Group) and dataset_name in f[k]),
            key=key,
        )
        times = np.asarray(f["times"][:]) if "times" in f else None
    return groups, times
