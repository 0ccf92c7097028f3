"""Data preprocessing: .mat -> per-field .npy conversion, dataset parsing
and merging.

reference: libs/mat2npy_minchan.py (.mat -> per-field npy + metadata),
libs/parse_npy.py / parse_npy_pino.py (energy-spectrum extraction),
libs/merge_npy_pino.py (dataset merging).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..utils.misc import spectrum2, spectrum3


def mat_to_npy(mat_path: str, out_folder: str,
               fields: Sequence[str] = ("U", "V", "W", "P"),
               re: float = 178.1899):
    """Split a .mat data dump into per-step per-field .npy files + a
    metadata.npy with mean/std (mat2npy_minchan.py semantics)."""
    import scipy.io
    os.makedirs(out_folder, exist_ok=True)
    data = scipy.io.loadmat(mat_path, mat_dtype=True)
    meta = {"re": re}
    for field in fields:
        if field not in data:
            continue
        arr = np.asarray(data[field])
        # leading axis = time steps
        for i in range(arr.shape[0]):
            np.save(os.path.join(out_folder,
                                 f"{field}_field_{i:06d}.npy"), arr[i])
        meta[f"{field}_field"] = {"mean": arr.mean(0),
                                  "std": arr.std(0) + 1e-8}
    np.save(os.path.join(out_folder, "metadata.npy"), meta)
    return out_folder


def parse_energy_spectra(folder: str, field_tag: str = "V_planes",
                         three_d: bool = False):
    """Compute per-snapshot radial energy spectra for every file matching
    `field_tag` (parse_npy.py:26 spectrum2/spectrum3 usage)."""
    files = sorted(f for f in os.listdir(folder) if field_tag in f
                   and f.endswith(".npy"))
    spectra = []
    fn = spectrum3 if three_d else spectrum2
    for f in files:
        arr = np.load(os.path.join(folder, f))
        spectra.append(np.asarray(fn(arr)))
    return np.stack(spectra) if spectra else np.zeros((0,))


def merge_datasets(folders: Sequence[str], out_path: str,
                   res: Sequence[float] = ()):
    """Merge several trajectory .npy archives into one multi-Reynolds npz
    (merge_npy_pino.py semantics): data1 = stacked trajectories,
    data2 = per-sample Reynolds numbers."""
    datas, res_all = [], []
    for i, folder in enumerate(folders):
        if os.path.isdir(folder):
            files = sorted(f for f in os.listdir(folder)
                           if f.endswith(".npy") and "metadata" not in f)
            arr = np.stack([np.load(os.path.join(folder, f))
                            for f in files])
        else:
            arr = np.load(folder)
        datas.append(arr)
        re_val = res[i] if i < len(res) else 40.0
        res_all.append(np.full((len(arr),), re_val))
    data1 = np.concatenate(datas)
    data2 = np.concatenate(res_all)
    np.savez(out_path, data1=data1, data2=data2)
    return out_path
