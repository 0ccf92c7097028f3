"""Channel-flow plane/field datasets + on-device batch iteration.

reference: libs/pde_data_loader.py:8 (PDEDataset), :72 (SequentialPDEDataset),
:135 (FullFieldNSDataset) — per-step .npy files + metadata.npy mean/std.

TPU re-design: these datasets are small (thousands of 32x32 planes), so the
whole split is stacked into device arrays once; training scans batches on
device instead of a worker-process DataLoader.  The on-disk format (one .npy
per step + a metadata.npy dict) is kept compatible with the reference, and
`generate_channel_dataset` produces it by rolling out the JAX env — replacing
the reference's MATLAB-coupled collection loop (run_control.py:236-293).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.normalization import NormalizerGivenMeanStd


def _load_sorted(folder, tag):
    files = sorted(f for f in os.listdir(folder) if tag in f)
    return [os.path.join(folder, f) for f in files]


def _stack(files, indices):
    """Batch-load .npy files; uses the native parallel loader (C/pthreads,
    native/fastloader.c) with a numpy fallback."""
    from ..native import load_npy_batch
    return load_npy_batch([files[i] for i in indices])


@dataclass
class PDEDataset:
    """(p_plane, v_plane) pairs, normalized, channels-last (H, W, 1).

    Loads everything up front into two arrays; index/batch access is O(1)
    on device (pde_data_loader.py:8-69 semantics)."""
    p: np.ndarray
    v: np.ndarray
    p_norm: NormalizerGivenMeanStd
    v_norm: NormalizerGivenMeanStd

    @classmethod
    def from_folder(cls, data_folder, data_index, downsample_rate=1,
                    x_range=32, y_range=32, use_patch=False):
        meta = np.load(os.path.join(data_folder, "metadata.npy"),
                       allow_pickle=True).tolist()
        if "P_planes" in meta:
            p_name, v_name = "P_planes", "V_planes"
        elif "P_plane" in meta:
            p_name, v_name = "P_plane", "V_plane"
        else:
            raise RuntimeError("Not recognized key name!")
        p_files = _load_sorted(data_folder, p_name)
        v_files = _load_sorted(data_folder, v_name)
        if use_patch:
            # split each plane into a stack of (x_range, y_range) patches
            # folded into the sample axis; normalizer stats are the patch
            # mean (pde_data_loader.py:33-41 use_patch branch)
            ds = lambda a: a.reshape(-1, x_range, y_range)
            ds_stat = lambda a: a.reshape(-1, x_range, y_range).mean(0)
        else:
            ds = lambda a: a[::downsample_rate,
                             ::downsample_rate][:x_range, :y_range]
            ds_stat = ds
        p_mean = ds_stat(np.asarray(meta[p_name]["mean"]))
        p_std = ds_stat(np.asarray(meta[p_name]["std"]))
        v_mean = ds_stat(np.asarray(meta[v_name]["mean"]))
        v_std = ds_stat(np.asarray(meta[v_name]["std"]))
        p = np.stack([ds(a) for a in _stack(p_files, data_index)])
        v = np.stack([ds(a) for a in _stack(v_files, data_index)])
        if use_patch:  # fold the patch axis into the sample axis
            p = p.reshape(-1, x_range, y_range)
            v = v.reshape(-1, x_range, y_range)
        p_norm = NormalizerGivenMeanStd(jnp.asarray(p_mean),
                                        jnp.asarray(p_std))
        v_norm = NormalizerGivenMeanStd(jnp.asarray(v_mean),
                                        jnp.asarray(v_std))
        return cls(p=p, v=v, p_norm=p_norm, v_norm=v_norm)

    def __len__(self):
        return len(self.p)

    def arrays(self, dtype=jnp.float32):
        """Whole split as normalized device arrays (N, H, W, 1)."""
        p = self.p_norm.encode(jnp.asarray(self.p, dtype))[..., None]
        v = self.v_norm.encode(jnp.asarray(self.v, dtype))[..., None]
        return p, v


@dataclass
class SequentialPDEDataset(PDEDataset):
    """Length-`timestep` (p, v) sequences (pde_data_loader.py:72-132)."""
    timestep: int = 2

    @classmethod
    def from_folder(cls, data_folder, data_index, downsample_rate=1,
                    x_range=32, y_range=32, timestep=2):
        base = PDEDataset.from_folder(data_folder, data_index,
                                      downsample_rate, x_range, y_range)
        return cls(p=base.p, v=base.v, p_norm=base.p_norm, v_norm=base.v_norm,
                   timestep=timestep)

    def __len__(self):
        return len(self.p) // self.timestep

    def arrays(self, dtype=jnp.float32):
        """(N, T, H, W, 1) sequence arrays."""
        n = len(self) * self.timestep
        p = self.p_norm.encode(jnp.asarray(self.p[:n], dtype))
        v = self.v_norm.encode(jnp.asarray(self.v[:n], dtype))
        shape = (len(self), self.timestep, *p.shape[1:], 1)
        return p.reshape(shape), v.reshape(shape)


@dataclass
class FullFieldNSDataset:
    """Boundary v-plane -> multi-plane v-field + full U/V/W/Re/dpdx for the
    physics-informed loss (pde_data_loader.py:135-198)."""
    v_plane: np.ndarray   # (N, T, X, Z)
    v_field: np.ndarray   # (N, T, P, X, Z)
    U: np.ndarray
    V: np.ndarray
    W: np.ndarray
    re: float
    dpdx: np.ndarray
    bound_v_norm: NormalizerGivenMeanStd
    p_plane_norm: Optional[NormalizerGivenMeanStd] = None

    @classmethod
    def from_folder(cls, data_folder, data_index, plane_indexs,
                    timestep=1, **_):
        meta = np.load(os.path.join(data_folder, "metadata.npy"),
                       allow_pickle=True).tolist()
        u_files = _load_sorted(data_folder, "U_field")
        v_files = _load_sorted(data_folder, "V_field")
        w_files = _load_sorted(data_folder, "W_field")
        v_mean = np.asarray(meta["V_field"]["mean"])
        v_std = np.asarray(meta["V_field"]["std"])
        bound_norm = NormalizerGivenMeanStd(
            jnp.asarray(v_mean[:, -1, :]), jnp.asarray(v_std[:, -1, :]))
        dpdx_all = np.asarray(meta["U_field"]["dpdx"])
        re = float(np.asarray(meta["re"]))

        n_seq = len(data_index) // timestep
        idx = np.asarray(data_index)[:n_seq * timestep].reshape(n_seq,
                                                                timestep)
        V = np.stack([_stack(v_files, row) for row in idx])
        U = np.stack([_stack(u_files, row) for row in idx])
        W = np.stack([_stack(w_files, row) for row in idx])
        v_plane = np.asarray(
            bound_norm.encode(jnp.asarray(V[..., -1, :])))
        planes = []
        for pid in plane_indexs:
            planes.append(np.asarray(
                bound_norm.encode(jnp.asarray(V[..., pid, :]))))
        v_field = np.stack(planes, axis=2)  # (N, T, P, X, Z)
        dpdx = dpdx_all[idx]
        return cls(v_plane=v_plane, v_field=v_field, U=U, V=V, W=W, re=re,
                   dpdx=dpdx, bound_v_norm=bound_norm)

    def __len__(self):
        return len(self.v_plane)


def batch_arrays(arrays, batch_size, key=None, drop_remainder=True):
    """Reshape (N, ...) arrays into (n_batches, B, ...), optionally
    shuffled — the on-device replacement for a DataLoader."""
    n = arrays[0].shape[0]
    n_batches = n // batch_size
    if key is not None:
        perm = jax.random.permutation(key, n)
        arrays = [a[perm] for a in arrays]
    out = []
    for a in arrays:
        a = a[:n_batches * batch_size]
        out.append(a.reshape(n_batches, batch_size, *a.shape[1:]))
    return out


# ---------------------------------------------------------------------------
# dataset generation from the JAX env (replaces run_control.py:236-293)
# ---------------------------------------------------------------------------

def generate_channel_dataset(out_folder: str, n_steps: int,
                             env=None, policy: str = "gt",
                             detect_plane: int = 25,
                             save_fields: bool = False,
                             seed: int = 0,
                             env_kwargs: Optional[dict] = None):
    """Roll out the channel env and write the reference on-disk format:
    P_planes_<i>.npy / V_planes_<i>.npy (+ U/V/W_field_<i>.npy) and a
    metadata.npy dict with running mean/std, Re, and dpdx history."""
    from ..envs import NSControlEnv
    from ..envs import channel_flow as cf

    os.makedirs(out_folder, exist_ok=True)
    if env is None:
        kw = {"detect_plane": detect_plane, "seed": seed,
              "noise_scale": 0.05}
        kw.update(env_kwargs or {})
        env = NSControlEnv(**kw)
    key = jax.random.PRNGKey(seed)
    # whole rollout on device in one scan, single host fetch at the end.
    # Unfused path: the collecting scan's carry copies push the fused
    # boundary-pressure kernel over the 16 MB scoped-VMEM budget on v5e
    # (observed AOT OOM at 18.19M); data generation is a one-shot batch
    # job where the XLA path's ~2x step cost is immaterial.
    with cf.force_unfused_poisson():
        env.state, outs = cf.rollout(
            env.grid, env.state, n_steps, detect_plane=detect_plane,
            policy=policy, key=key, collect_fields=save_fields)
    outs = jax.device_get(outs)
    p_arr, v_arr, dpdx_all = outs[0], outs[1], outs[2]
    for i in range(n_steps):
        np.save(os.path.join(out_folder, f"P_planes_{i:06d}.npy"), p_arr[i])
        np.save(os.path.join(out_folder, f"V_planes_{i:06d}.npy"), v_arr[i])
        if save_fields:
            np.save(os.path.join(out_folder, f"U_field_{i:06d}.npy"),
                    outs[3][i])
            np.save(os.path.join(out_folder, f"V_field_{i:06d}.npy"),
                    outs[4][i])
            np.save(os.path.join(out_folder, f"W_field_{i:06d}.npy"),
                    outs[5][i])
    meta = {
        "P_planes": {"mean": p_arr.mean(0), "std": p_arr.std(0) + 1e-8},
        "V_planes": {"mean": v_arr.mean(0), "std": v_arr.std(0) + 1e-8},
        "re": 178.1899,
    }
    if save_fields:
        u_arr, v_f, w_arr = outs[3], outs[4], outs[5]
        meta["U_field"] = {"mean": u_arr.mean(0), "std": u_arr.std(0) + 1e-8,
                           "dpdx": np.asarray(dpdx_all)}
        meta["V_field"] = {"mean": v_f.mean(0), "std": v_f.std(0) + 1e-8}
        meta["W_field"] = {"mean": w_arr.mean(0), "std": w_arr.std(0) + 1e-8}
    np.save(os.path.join(out_folder, "metadata.npy"), meta)
    return out_folder
