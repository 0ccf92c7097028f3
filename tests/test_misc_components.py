"""Fourier continuation, graph layers, preprocessing tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu.data.preprocess import (merge_datasets,
                                                    parse_energy_spectra)
from pde_policylearning_tpu.models.graph import GAT, GCN
from pde_policylearning_tpu.ops.fourier_continuation import FCLegendre


def test_fc_legendre_extends_smoothly():
    fc = FCLegendre(n=3, d=8, dtype=jnp.float64)
    x = jnp.linspace(0, 1, 20)[None, :] ** 2  # non-periodic
    ext = fc.extend_left_right(x)
    assert ext.shape == (1, 28)
    # the extension connects the right end back toward the left end values
    assert bool(jnp.isfinite(ext).all())
    # 2d extension
    f = jnp.broadcast_to(x[0][None, :], (20, 20))[None]
    e2 = fc(f)
    assert e2.shape == (1, 28, 28)


def test_fc_makes_fft_decay_faster():
    """Continuation should reduce the spurious high-frequency content of a
    non-periodic ramp."""
    fc = FCLegendre(n=4, d=12, dtype=jnp.float64)
    x = jnp.linspace(0, 1, 32)[None, :]
    raw_spec = jnp.abs(jnp.fft.rfft(x))[0]
    ext_spec = jnp.abs(jnp.fft.rfft(fc.extend_left_right(x)))[0]
    # compare relative high-frequency energy
    raw_hf = float(jnp.sum(raw_spec[8:]) / jnp.sum(raw_spec))
    ext_hf = float(jnp.sum(ext_spec[8:]) / jnp.sum(ext_spec))
    assert ext_hf < raw_hf


def test_gcn_gat():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 4))
    adj = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, 10, 10)))
    gcn = GCN(out_features=8, num_layers=2)
    p = gcn.init(jax.random.PRNGKey(2), x, adj)
    out = gcn.apply(p, x, adj)
    assert out.shape == (2, 10, 8)

    gat = GAT(out_features=8, num_layers=1, activation="relu")
    p2 = gat.init(jax.random.PRNGKey(3), x, adj)
    out2 = gat.apply(p2, x, adj)
    assert out2.shape == (2, 10, 8)
    assert bool(jnp.isfinite(out2).all())


def test_preprocess_roundtrip(tmp_path):
    import os
    folder = str(tmp_path / "raw")
    os.makedirs(folder)
    for i in range(3):
        np.save(os.path.join(folder, f"V_planes_{i:02d}.npy"),
                np.random.rand(8, 8))
    spectra = parse_energy_spectra(folder, "V_planes")
    assert spectra.shape == (3, 8)

    out = merge_datasets([folder], str(tmp_path / "merged.npz"),
                         res=[100.0])
    data = np.load(out)
    assert data["data1"].shape == (3, 8, 8)
    assert (data["data2"] == 100.0).all()


def test_mat_to_npy(tmp_path):
    import scipy.io
    mat_path = str(tmp_path / "dump.mat")
    scipy.io.savemat(mat_path, {"U": np.random.rand(4, 6, 6)})
    out = str(tmp_path / "npys")
    from pde_policylearning_tpu.data.preprocess import mat_to_npy
    mat_to_npy(mat_path, out, fields=("U",))
    import os
    files = os.listdir(out)
    assert sum(f.startswith("U_field") for f in files) == 4
    meta = np.load(os.path.join(out, "metadata.npy"),
                   allow_pickle=True).tolist()
    assert "U_field" in meta


def test_fem_helpers():
    from pde_policylearning_tpu.ops import fem
    b, w = fem.quadpts(2)
    assert abs(w.sum() - 1.0) < 1e-12
    A = fem.get_laplacian_1d(8, normalize=False)
    # row sums of an unnormalized stiffness matrix vanish
    assert np.abs(A.sum(1)).max() < 1e-10
    M = fem.get_mass_1d(np.linspace(0, 1, 8))
    assert abs(M.sum() - 1.0) < 1e-10  # integrates the constant
    D = fem.get_distance_matrix(np.linspace(0, 1, 5))
    assert D.shape == (5, 5, 2) and D[0, 0, 0] == 0.0
    ext = fem.apply_periodic_boundary(np.arange(6), mod_length=2)
    assert list(ext) == [0, 1, 2, 3, 4, 5, 0, 1]
