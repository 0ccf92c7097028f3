"""DINo datasets: on-the-fly Wave / Navier-Stokes trajectory generation +
observation masks.

reference: libs/DINo/data_pdes.py:54-290 (shelve-cached on-the-fly Wave and
NavierStokes datasets with GaussianRF initial conditions),
libs/DINo/utils.py:173-197 (irregular-grid masks).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .synthetic import gaussian_rf_2d, ns_vorticity_rollout


@partial(jax.jit, static_argnames=("n_steps", "record_every"))
def wave_rollout(u0, v0, speed: float, dt: float, n_steps: int,
                 record_every: int = 1):
    """2-D periodic wave equation u_tt = c^2 Lap(u), pseudo-spectral with
    leapfrog time stepping (data_pdes.py Wave dataset semantics)."""
    B, N, _ = u0.shape
    k = jnp.fft.fftfreq(N, d=1.0 / N) * 2 * jnp.pi
    lap = -(k[:, None] ** 2 + k[None, :] ** 2)

    def accel(u):
        u_h = jnp.fft.fft2(u, axes=(-2, -1))
        return jnp.real(jnp.fft.ifft2(speed ** 2 * lap * u_h, axes=(-2, -1)))

    def step(carry, _):
        u, v = carry
        v = v + dt * accel(u)
        u = u + dt * v
        return (u, v), None

    def record_block(carry, _):
        carry, _ = jax.lax.scan(step, carry, None, length=record_every)
        return carry, carry[0]

    n_records = n_steps // record_every
    _, frames = jax.lax.scan(record_block, (u0, v0), None, length=n_records)
    return jnp.moveaxis(frames, 0, -1)  # (B, N, N, n_records)


def generate_wave_data(key, n_traj: int, size: int, nt: int,
                       speed: float = 0.5, t_total: float = 1.0,
                       substeps: int = 8):
    """(n_traj, nt, size, size, 1) wave trajectories from GRF ICs."""
    u0 = gaussian_rf_2d(key, size, n_traj, alpha=3.0, tau=5.0)
    v0 = jnp.zeros_like(u0)
    dt = t_total / ((nt - 1) * substeps)
    frames = wave_rollout(u0, v0, speed, dt, n_steps=(nt - 1) * substeps,
                          record_every=substeps)
    traj = jnp.concatenate([u0[..., None], frames], axis=-1)
    return jnp.moveaxis(traj, -1, 1)[..., None]  # (B, T, N, N, 1)


def generate_navier_stokes_data(key, n_traj: int, size: int, nt: int,
                                visc: float = 1e-3, t_total: float = 1.0,
                                substeps: int = 16, forcing=None):
    """(n_traj, nt, size, size, 1) NS vorticity trajectories
    (data_pdes.py:211-290)."""
    if forcing is None:
        xs = np.linspace(0, 1, size, endpoint=False)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        forcing = jnp.asarray(
            0.1 * (np.sin(2 * np.pi * (X + Y)) + np.cos(2 * np.pi * (X + Y))))
    w0 = gaussian_rf_2d(key, size, n_traj)
    dt = t_total / ((nt - 1) * substeps)
    frames = ns_vorticity_rollout(w0, forcing, visc, dt,
                                  n_steps=(nt - 1) * substeps,
                                  record_every=substeps,
                                  deriv_scale=2.0 * np.pi)
    traj = jnp.concatenate([w0[..., None], frames], axis=-1)
    return jnp.moveaxis(traj, -1, 1)[..., None]


def generate_mask(key, h_size: int, w_size: int, mask_data: float = 0.0):
    """Random observation mask: keep (1 - mask_data) of grid points
    (DINo/utils.py:191-197)."""
    if mask_data <= 0:
        return jnp.ones((h_size, w_size), bool)
    keep = jax.random.uniform(key, (h_size, w_size)) >= mask_data
    return keep


def generate_skipped_lat_lon_mask(h_size: int, w_size: int,
                                  base_jump: int = 0):
    """Regular lat-lon subsampling mask (DINo/utils.py:173-189): skip more
    aggressively near the poles (rows)."""
    mask = np.zeros((h_size, w_size), bool)
    for i in range(h_size):
        # distance to nearest pole normalized to [0, 1]
        d = min(i, h_size - 1 - i) / (h_size / 2)
        jump = 2 ** (base_jump + int(np.ceil(2 * (1 - d))))
        mask[i, ::jump] = True
    return jnp.asarray(mask)


# ---------------------------------------------------------------------------
# ShallowWater-on-the-sphere (data_pdes.py:341-385 ShallowWaterDataset)
# ---------------------------------------------------------------------------

def spherical_xyz_coords(nlat: int, nlon: int) -> np.ndarray:
    """(nlat, nlon, 3) unit-sphere xyz coordinates — the coordinate system
    DINo's ShallowWaterDataset feeds its INR decoder (data_pdes.py:352-365
    builds the same x/y/z stack from phi/theta)."""
    theta = (np.arange(nlat) + 0.5) * np.pi / nlat          # colatitude
    phi = np.arange(nlon) * 2 * np.pi / nlon                # longitude
    T, P = np.meshgrid(theta, phi, indexing="ij")
    return np.stack([np.cos(P) * np.sin(T),
                     np.sin(P) * np.sin(T),
                     np.cos(T)], axis=-1).astype(np.float32)


def generate_shallow_water_data(key, n_traj: int, nlat: int, nlon: int,
                                nt: int, seed_offset: int = 0):
    """(n_traj, nt, nlat, nlon, 2) [height, vorticity] trajectories.

    The reference loads dedalus-generated HDF5 runs it does not ship
    (data_pdes.py:343-385); this self-hosting equivalent evolves random
    band-limited spherical fields with the per-degree gravity-wave
    dispersion of the linearized rotating SWE through our real SHT
    (ops/sht.py), with vorticity diagnosed as the spherical Laplacian of
    the geostrophic streamfunction (~ height)."""
    from ..ops.sht import irsht

    rng = np.random.default_rng(1234 + seed_offset)
    lmax = nlat // 2
    ls = np.arange(lmax)
    flm = (rng.normal(size=(n_traj, lmax, lmax, 1))
           + 1j * rng.normal(size=(n_traj, lmax, lmax, 1)))
    for l in range(lmax):
        flm[:, l, l + 1:, :] = 0
    flm[:, :, 0, :] = flm[:, :, 0, :].real
    flm = flm / (1.0 + ls[:, None] ** 2)[None, :, :, None]

    omega = np.sqrt(ls * (ls + 1.0))                # gravity-wave dispersion
    lap = -(ls * (ls + 1.0))                        # spherical Laplacian

    # eager complex constants are UNIMPLEMENTED on the axon TPU backend
    # (see CLAUDE.md): feed real/imag separately and combine under jit
    @partial(jax.jit, static_argnames=("nlat", "nlon"))
    def _synth(fr, fi, nlat, nlon):
        return irsht(jax.lax.complex(fr, fi), nlat, nlon)

    frames = []
    for k in range(nt):
        t = k / max(nt - 1, 1)
        phase = np.exp(1j * omega * t)[None, :, None, None]
        fh = flm * phase
        fw = fh * lap[None, :, None, None]
        h = np.asarray(_synth(jnp.asarray(fh.real, jnp.float32),
                              jnp.asarray(fh.imag, jnp.float32),
                              nlat, nlon))
        w = np.asarray(_synth(jnp.asarray(fw.real, jnp.float32),
                              jnp.asarray(fw.imag, jnp.float32),
                              nlat, nlon))
        frames.append(np.concatenate([h, w / max(lmax ** 2 / 4.0, 1.0)],
                                     axis=-1))
    return jnp.asarray(np.stack(frames, axis=1), jnp.float32)


class ShallowWaterDataset:
    """DINo-format spherical SWE dataset (data_pdes.py:341-405).

    If `root` holds the reference's dedalus HDF5 layout
    (shallow_water_{train,test}/traj_%04d.h5 with tasks/height and
    tasks/vorticity), trajectories are read from disk with the reference's
    scalings (height*3000, vorticity*2, every-2nd grid point).  Otherwise
    trajectories are generated on the fly (self-hosting)."""

    def __init__(self, n_seq: int, nt: int, nlat: int = 32, nlon: int = 64,
                 root=None, group: str = "train"):
        import os
        self.n_seq, self.nt = n_seq, nt
        self.group = group
        self._h5_dir = None
        if root is not None:
            d = os.path.join(
                root, f"shallow_water_{'test' if group == 'test' else 'train'}")
            if os.path.isdir(d):
                self._h5_dir = d
        if self._h5_dir is None:
            self.data = np.asarray(generate_shallow_water_data(
                None, n_seq, nlat, nlon, nt,
                seed_offset=0 if group == "train" else 10_000))
            nlat_eff, nlon_eff = nlat, nlon
        else:
            trajs = [self._load_h5(i) for i in range(n_seq)]
            self.data = np.stack(trajs)[:, :nt]
            nlat_eff, nlon_eff = self.data.shape[2], self.data.shape[3]
        self.coords = spherical_xyz_coords(nlat_eff, nlon_eff)
        self.coord_dim = 3

    def _load_h5(self, traj_id: int):
        import os
        import h5py
        with h5py.File(os.path.join(self._h5_dir,
                                    f"traj_{traj_id:04d}.h5"), "r") as f:
            h = np.asarray(f["tasks/height"][:, ::2, ::2]) * 3000.0
            w = np.asarray(f["tasks/vorticity"][:, ::2, ::2]) * 2.0
        return np.stack([h, w], axis=-1)  # (T, nlat, nlon, 2)

    def __len__(self):
        return self.n_seq

    def __getitem__(self, index: int):
        return {
            "data": self.data[index],
            "t": np.linspace(0.0, 1.0, self.nt, dtype=np.float32),
            "traj": index,
            "index": index,
            "coords": self.coords,
        }

    def arrays(self):
        return jnp.asarray(self.data), jnp.asarray(self.coords)


# ---------------------------------------------------------------------------
# SST (data_pdes.py:389-466)
# ---------------------------------------------------------------------------

class SSTDataset:
    """Sea-surface-temperature forecasting dataset (data_pdes.py SST).

    With `data_dir` pointing at the reference's netCDF layout
    (data_{zone}.nc with thetao/daily_mean/daily_std), fields are loaded
    and double-normalized exactly like the reference (climatology, then
    per-frame standardization).  Without it (netCDF4 is not in this image
    anyway), synthetic zones are generated: seasonal-cycle climatology +
    slowly drifting Gaussian-random-field anomalies, run through the SAME
    normalization pipeline so downstream code sees identical statistics.
    """
    var_names = ["thetao", "daily_mean", "daily_std"]
    zone_size = 64

    def __init__(self, nt_cond: int, nt_pred: int, train: bool = True,
                 data_dir=None, zones=range(1, 5), n_days: int = 120,
                 seed: int = 0):
        self.nt_cond, self.nt_pred = nt_cond, nt_pred
        self.train = train
        self.zones = list(zones)
        self.data, self.climato, self.cst = {}, {}, {}
        for zone in self.zones:
            raw = None
            if data_dir is not None:
                raw = self._try_load_zone(data_dir, zone)
            if raw is None:
                raw = self._synthesize_zone(zone, n_days, seed)
            theta, mu_c, sd_c = raw
            theta = (theta - mu_c) / sd_c            # climatology normalize
            mu = theta.mean(axis=(1, 2)).reshape(-1, 1, 1)
            sd = theta.std(axis=(1, 2)).reshape(-1, 1, 1) + 1e-8
            self.data[zone] = (theta - mu) / sd      # per-frame normalize
            self.climato[zone] = (mu_c, sd_c)
            self.cst[zone] = (mu, sd)
            self.len_ = len(theta)
        first = 0 if train else int(0.8 * self.len_)
        usable = int(0.8 * self.len_) if train else self.len_ - int(0.8 * self.len_)
        self.first = first
        self.len_ = max(1, int(usable * 0.1) - nt_pred - nt_cond - 1)
        self._total_len = len(self.zones) * self.len_
        xs = np.linspace(-1.0, 1.0, self.zone_size, dtype=np.float32)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        self.coords = np.stack([X, Y], axis=-1)
        self.coord_dim = 2

    @staticmethod
    def _try_load_zone(data_dir, zone):
        import os
        path = os.path.join(data_dir, f"data_{zone}.nc")
        if not os.path.exists(path):
            return None
        try:
            from netCDF4 import Dataset as NC  # gated: not in this image
        except ImportError:
            return None
        f = NC(path, "r")
        theta = np.asarray(f.variables["thetao"][:].data)
        mu = np.asarray(f.variables["daily_mean"][:].data).reshape(-1, 1, 1)
        sd = np.asarray(f.variables["daily_std"][:].data).reshape(-1, 1, 1)
        return theta, mu, sd

    def _synthesize_zone(self, zone, n_days, seed):
        rng = np.random.default_rng(seed * 1000 + zone)
        S = self.zone_size
        days = np.arange(n_days)
        mu_c = (15.0 + 8.0 * np.sin(2 * np.pi * days / 365.0
                                    + zone)).reshape(-1, 1, 1)
        sd_c = np.full((n_days, 1, 1), 2.0)
        k = np.fft.fftfreq(S)[:, None] ** 2 + np.fft.fftfreq(S)[None, :] ** 2
        spec_decay = 1.0 / (1.0 + 400.0 * k)
        a = np.fft.ifft2(np.fft.fft2(rng.normal(size=(S, S))) * spec_decay).real
        b = np.fft.ifft2(np.fft.fft2(rng.normal(size=(S, S))) * spec_decay).real
        fields = []
        for d in days:
            w = 2 * np.pi * d / 60.0
            anom = np.cos(w) * a + np.sin(w) * b \
                + 0.1 * rng.normal(size=(S, S))
            anom = 4.0 * anom / (np.abs(anom).max() + 1e-8)
            fields.append(mu_c[d, 0, 0] + anom * sd_c[d, 0, 0])
        return np.asarray(fields, np.float32), mu_c, sd_c

    def __len__(self):
        return self._total_len

    def __getitem__(self, idx: int):
        zone = self.zones[idx // self.len_]
        # stride-10 through the archive like the reference (data_pdes.py:447)
        i = (idx % self.len_) * 10 + self.nt_cond + 1 + self.first
        seq = self.data[zone][i - self.nt_cond + 1:
                              i + self.nt_pred + 1]
        sl = slice(i + 1, i + self.nt_pred + 1)
        return {
            "data": seq[..., None],                        # (T, S, S, 1)
            "t": np.arange(self.nt_cond + self.nt_pred, dtype=np.float32),
            "index": idx,
            "coords": self.coords,
            "mu_clim": self.climato[zone][0][sl],
            "std_clim": self.climato[zone][1][sl],
            "mu_norm": self.cst[zone][0][sl],
            "std_norm": self.cst[zone][1][sl],
        }
