"""Library-level dataset utilities: Darcy/NS loaders, grid positional
encoding, transforms, generic tensor/zarr/hdf5 datasets, spherical SWE.

reference: neuralop/datasets/ — darcy.py:9,61; navier_stokes.py:13,80,147;
burgers.py:4; pt_dataset.py:8; tensor_dataset.py:4; zarr_dataset.py:6;
hdf5_dataset.py:6; positional_encoding.py:3,21; transforms.py:39
(RandomMGPatch); spherical_swe.py:7,27.

Layout: channels-last.  Loaders accept .npz/.npy/.mat (and .pt via torch if
available); on-the-fly generation backs the Darcy/NS loaders when files are
absent, keeping the pipeline self-hosting.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# generic file reading (libs/utilities3.py:19-71 MatReader equivalent)
# ---------------------------------------------------------------------------

class MatReader:
    """Read .mat (scipy or h5py for v7.3) / .npz / .npy / .pt files
    (utilities3.py:19-71)."""

    def __init__(self, file_path: str):
        self.file_path = file_path
        self._data = None
        self._load()

    def _load(self):
        path = self.file_path
        if path.endswith(".npz") or path.endswith(".npy"):
            self._data = np.load(path, allow_pickle=True)
            return
        if path.endswith(".pt"):
            import torch
            self._data = torch.load(path, map_location="cpu")
            return
        try:
            import scipy.io
            self._data = scipy.io.loadmat(path)
        except (NotImplementedError, ValueError):
            import h5py
            self._data = h5py.File(path, "r")

    def read_field(self, field: str) -> np.ndarray:
        x = self._data[field]
        x = np.asarray(x)
        # h5py mat v7.3 stores transposed
        import h5py
        if isinstance(self._data, h5py.File):
            x = x.T
        return x.astype(np.float32)


# ---------------------------------------------------------------------------
# positional encoding + transforms
# ---------------------------------------------------------------------------

def grid_positional_encoding(height: int, width: int,
                             grid_boundaries=((0, 1), (0, 1))):
    """(height, width, 2) coordinate channels (positional_encoding.py:21)."""
    xt = np.linspace(*grid_boundaries[0], height + 1)[:-1]
    yt = np.linspace(*grid_boundaries[1], width + 1)[:-1]
    gx, gy = np.meshgrid(xt, yt, indexing="ij")
    return jnp.asarray(np.stack([gx, gy], axis=-1), jnp.float32)


def append_2d_grid_positional_encoding(x, grid_boundaries=((0, 1), (0, 1))):
    """x: (N, H, W, C) -> (N, H, W, C+2) (positional_encoding.py:3)."""
    n, h, w, _ = x.shape
    grid = grid_positional_encoding(h, w, grid_boundaries)
    grid = jnp.broadcast_to(grid[None], (n, h, w, 2)).astype(x.dtype)
    return jnp.concatenate([x, grid], axis=-1)


class PositionalEmbedding2D:
    """Callable transform appending grid channels (transforms.py:20-36)."""

    def __init__(self, grid_boundaries=((0, 1), (0, 1))):
        self.grid_boundaries = grid_boundaries

    def __call__(self, data):
        return append_2d_grid_positional_encoding(
            data[None] if data.ndim == 3 else data,
            self.grid_boundaries).squeeze(0) if data.ndim == 3 else \
            append_2d_grid_positional_encoding(data, self.grid_boundaries)


class RandomMGPatch:
    """Random-shift multigrid patch transform (transforms.py:39-80):
    roll a random center, then extract nested center crops subsampled per
    level; x gets all levels stacked on channels, y the finest patch."""

    def __init__(self, levels: int = 2, seed: int = 0):
        self.levels = levels
        self.step = 2 ** levels
        self.rng = np.random.default_rng(seed)

    def _patches(self, img, step, height, width):
        if step == 1:
            return (img,)
        sh, sw = height // 4, width // 4
        inner = self._patches(img[sh:-sh, sw:-sw], step // 2,
                              height // 2, width // 2)
        return (img[::step, ::step], *inner)

    def __call__(self, data):
        x, y = data  # (H, W, C) each
        h, w = x.shape[0], x.shape[1]
        pos_h = int(self.rng.integers(0, h))
        pos_w = int(self.rng.integers(0, w))
        shift = (h // 2 - pos_h, w // 2 - pos_w)
        xs = jnp.roll(x, shift, axis=(0, 1))
        ys = jnp.roll(y, shift, axis=(0, 1))
        px = self._patches(xs, self.step, h, w)
        py = self._patches(ys, self.step, h, w)
        return jnp.concatenate(px, axis=-1), py[-1]


# ---------------------------------------------------------------------------
# generic datasets
# ---------------------------------------------------------------------------

@dataclass
class TensorDataset:
    """(x, y) pair container (tensor_dataset.py:4)."""
    x: np.ndarray
    y: np.ndarray
    transform_x: Optional[object] = None
    transform_y: Optional[object] = None

    def __len__(self):
        return len(self.x)

    def __getitem__(self, idx):
        x, y = self.x[idx], self.y[idx]
        if self.transform_x is not None:
            x = self.transform_x(x)
        if self.transform_y is not None:
            y = self.transform_y(y)
        return {"x": x, "y": y}

    def arrays(self, dtype=jnp.float32):
        return jnp.asarray(self.x, dtype), jnp.asarray(self.y, dtype)


class ZarrDataset:
    """Lazy zarr-backed PDE dataset (zarr_dataset.py:6-125).

    Same contract as the reference: fixed resolution->subsample-step map
    {128:8, 256:4, 512:2, 1024:1}, lazy store open (one handle cached per
    instance), x served at the subsampled resolution, y with a leading
    channel axis, optional transform_x/transform_y.  The `zarr` package is
    not in this image, so the import is gated at construction time."""

    _RES_TO_STEP = {128: 8, 256: 4, 512: 2, 1024: 1}

    def __init__(self, filename, resolution: int = 128, transform_x=None,
                 transform_y=None, n_samples=None):
        try:
            import zarr
        except ImportError as e:  # pragma: no cover - zarr not in image
            raise ImportError(
                "ZarrDataset requires the `zarr` package "
                "(reference: neuralop/datasets/zarr_dataset.py:6)") from e
        if resolution not in self._RES_TO_STEP:
            raise ValueError(
                f"Got resolution={resolution}, expected one of "
                f"{sorted(self._RES_TO_STEP)}")
        self._zarr = zarr
        self.subsample_step = self._RES_TO_STEP[resolution]
        self.filename = str(filename)
        self._data = None
        self.transform_x = transform_x
        self.transform_y = transform_y
        if n_samples is not None:
            self.n_samples = n_samples
        else:
            data = zarr.open(self.filename, mode="r")
            self.n_samples = data["x"].shape[0] if hasattr(data, "keys") \
                else data.shape[0]
            del data

    def attrs(self, array_name: str, name: str):
        data = self._zarr.open(self.filename, mode="r")
        value = data[array_name].attrs[name]
        del data
        return value

    @property
    def data(self):
        if self._data is None:
            self._data = self._zarr.open(self.filename, mode="r")
        return self._data

    def __len__(self):
        return self.n_samples

    def __getitem__(self, idx):
        if not isinstance(idx, int):
            for i in idx:
                assert i < self.n_samples
        else:
            assert idx < self.n_samples, (
                f"Trying to access sample {idx} of dataset with "
                f"{self.n_samples} samples")
        s = self.subsample_step
        x = np.asarray(self.data["x"][idx, ::s, ::s], np.float32)
        y = np.asarray(self.data["y"][idx, ::s, ::s], np.float32)[None]
        if self.transform_x is not None:
            x = self.transform_x(x)
        if self.transform_y is not None:
            y = self.transform_y(y)
        return {"x": x, "y": y}


class H5pyDataset:
    """Lazy HDF5-backed dataset (hdf5_dataset.py:6)."""

    def __init__(self, path, x_key="x", y_key="y", n_samples=None,
                 resolution=None):
        import h5py
        self.f = h5py.File(path, "r")
        self.x = self.f[x_key]
        self.y = self.f[y_key]
        self.n = n_samples or self.x.shape[0]
        self.sub = 1
        if resolution is not None and self.x.shape[1] != resolution:
            self.sub = self.x.shape[1] // resolution

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        s = self.sub
        return {"x": np.asarray(self.x[idx, ::s, ::s]),
                "y": np.asarray(self.y[idx, ::s, ::s])}


# ---------------------------------------------------------------------------
# Darcy / Navier-Stokes / Burgers loaders with self-hosting generation
# ---------------------------------------------------------------------------

def _darcy_coeff_from_grf(grf):
    """Piecewise-constant permeability: threshold a GRF (standard Darcy
    benchmark construction)."""
    return np.where(np.asarray(grf) >= 0, 12.0, 3.0)


def _solve_darcy(a, f=1.0, n_iter=2000):
    """Jacobi-ish solve of -div(a grad u) = f with u=0 boundary; good
    enough to generate consistent (a, u) training pairs."""
    a = jnp.asarray(a)
    n = a.shape[-1]
    h2 = (1.0 / (n - 1)) ** 2

    ae = 0.5 * (a + jnp.roll(a, -1, -1))
    aw = 0.5 * (a + jnp.roll(a, 1, -1))
    an = 0.5 * (a + jnp.roll(a, -1, -2))
    asth = 0.5 * (a + jnp.roll(a, 1, -2))
    diag = ae + aw + an + asth

    def sweep(_, u):
        nbr = (ae * jnp.roll(u, -1, -1) + aw * jnp.roll(u, 1, -1)
               + an * jnp.roll(u, -1, -2) + asth * jnp.roll(u, 1, -2))
        u_new = (nbr + f * h2) / diag
        u_new = u_new.at[..., 0, :].set(0).at[..., -1, :].set(0)
        u_new = u_new.at[..., :, 0].set(0).at[..., :, -1].set(0)
        return 0.5 * u + 0.5 * u_new

    return jax.lax.fori_loop(0, n_iter, sweep, jnp.zeros_like(a))


def load_darcy_flow(path: Optional[str] = None, n_train=100, n_test=20,
                    resolution=32, seed=0, batch_size=None):
    """Darcy (a -> u) dataset (neuralop/datasets/darcy.py:9,61).  Loads
    .mat/.npz with 'coeff'/'sol' keys, else generates GRF-threshold
    coefficients and solves."""
    if path is not None and os.path.exists(path):
        reader = MatReader(path)
        a = reader.read_field("coeff")
        u = reader.read_field("sol")
    else:
        from .synthetic import gaussian_rf_2d
        n = n_train + n_test
        grf = gaussian_rf_2d(jax.random.PRNGKey(seed), resolution, n,
                             alpha=2.0, tau=3.0)
        a = _darcy_coeff_from_grf(grf)
        u = np.asarray(jax.jit(_solve_darcy)(jnp.asarray(a)))
    a = a[..., None].astype(np.float32)
    u = u[..., None].astype(np.float32)
    train = TensorDataset(a[:n_train], u[:n_train])
    test = TensorDataset(a[n_train:n_train + n_test],
                         u[n_train:n_train + n_test])
    return train, test


def load_navier_stokes(path: Optional[str] = None, n_train=100, n_test=20,
                       resolution=32, nt=10, seed=0,
                       test_resolutions: Optional[Sequence[int]] = None):
    """NS vorticity (w0 -> w(T)) dataset (navier_stokes.py:13-147 loaders);
    generated by the pseudo-spectral solver when no file is given.

    With `test_resolutions`, returns (train, {f"{r}": TensorDataset}) —
    the reference's multi-resolution test_loaders contract (test sets are
    subsampled from the train resolution)."""
    if path is not None and os.path.exists(path):
        reader = MatReader(path)
        w = reader.read_field("u")
    else:
        from .synthetic import generate_kolmogorov_data
        n = n_train + n_test
        w = np.asarray(generate_kolmogorov_data(
            jax.random.PRNGKey(seed), n, resolution, nt))
    x = w[..., :1]
    y = w[..., -1:]
    train = TensorDataset(x[:n_train], y[:n_train])
    x_t = x[n_train:n_train + n_test]
    y_t = y[n_train:n_train + n_test]
    if test_resolutions is None:
        return train, TensorDataset(x_t, y_t)
    tests = {}
    full = x_t.shape[1]
    for r in test_resolutions:
        sub = max(1, full // r)
        tests[str(r)] = TensorDataset(x_t[:, ::sub, ::sub],
                                      y_t[:, ::sub, ::sub])
    return train, tests


def load_burgers(path: Optional[str] = None, n_train=100, n_test=20,
                 resolution=128, seed=0, visc=0.01):
    """Burgers (u0 -> u(T)) (burgers.py:4); generated spectrally when no
    file is given."""
    if path is not None and os.path.exists(path):
        reader = MatReader(path)
        u0 = reader.read_field("input")
        uT = reader.read_field("output")[:, -1]
    else:
        from .synthetic import gaussian_rf_2d
        n = n_train + n_test
        # 1-D GRF via a slice of a 2-D one
        u0 = np.asarray(gaussian_rf_2d(jax.random.PRNGKey(seed),
                                       resolution, n))[:, :, 0]
        uT = np.asarray(_burgers_rollout(jnp.asarray(u0), visc, 0.5))
    train = TensorDataset(u0[:n_train, :, None], uT[:n_train, :, None])
    test = TensorDataset(u0[n_train:n_train + n_test, :, None],
                         uT[n_train:n_train + n_test, :, None])
    return train, test


@jax.jit
def _burgers_rollout(u0, visc, t_total, n_steps=500):
    n = u0.shape[-1]
    k = jnp.fft.fftfreq(n, d=1.0 / n) * 2 * jnp.pi
    dt = t_total / n_steps

    def step(u, _):
        u_h = jnp.fft.fft(u)
        ux = jnp.real(jnp.fft.ifft(1j * k * u_h))
        uxx = jnp.real(jnp.fft.ifft(-(k ** 2) * u_h))
        return u + dt * (-u * ux + visc * uxx), None

    u, _ = jax.lax.scan(step, u0, None, length=n_steps)
    return u


def load_spherical_swe(n_train=20, n_test=4, nlat=32, nlon=64, nt=5,
                       seed=0):
    """On-the-fly spherical shallow-water dataset (spherical_swe.py:7,27 —
    the reference wraps torch_harmonics' ShallowWaterSolver).  Here: random
    band-limited initial height fields evolved by a linearized spectral SWE
    step using our SHT (gravity-wave dispersion per degree l)."""
    from ..ops.sht import irsht, rsht
    rng = np.random.default_rng(seed)
    n = n_train + n_test
    lmax = nlat // 2
    flm = (rng.normal(size=(n, lmax, lmax, 1))
           + 1j * rng.normal(size=(n, lmax, lmax, 1)))
    ls = np.arange(lmax)
    decay = 1.0 / (1 + ls[:, None] ** 2)
    for l in range(lmax):
        flm[:, l, l + 1:, :] = 0
    flm[:, :, 0, :] = flm[:, :, 0, :].real
    flm = flm * decay[None, :, :, None]
    # eager complex constants are UNIMPLEMENTED on the axon TPU backend:
    # feed real/imag separately and combine under jit (see CLAUDE.md)
    import jax
    from functools import partial

    @partial(jax.jit, static_argnames=("nlat", "nlon"))
    def _synth(fr, fi, nlat, nlon):
        return irsht(jax.lax.complex(fr, fi), nlat, nlon)

    h0 = _synth(jnp.asarray(flm.real, jnp.float32),
                jnp.asarray(flm.imag, jnp.float32), nlat, nlon)
    # linear evolution: each degree oscillates at omega_l ~ sqrt(l(l+1))
    omega = np.sqrt(ls * (ls + 1.0))
    fT = flm * np.cos(omega)[None, :, None, None]
    hT = _synth(jnp.asarray(fT.real, jnp.float32),
                jnp.asarray(fT.imag, jnp.float32), nlat, nlon)
    x = np.asarray(h0, np.float32)
    y = np.asarray(hT, np.float32)
    train = TensorDataset(x[:n_train], y[:n_train])
    test = TensorDataset(x[n_train:], y[n_train:])
    return train, test
