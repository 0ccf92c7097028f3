"""DeepONet (branch/trunk operator network).

reference: run_learning_beta_to_k.ipynb cell 6 uses deepxde's
`DeepONetCartesianProd` to learn PDE-backstepping gain kernels beta -> k.
This is the equivalent operator network: branch(u_sensors) . trunk(coords).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _MLP(nn.Module):
    layers: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x):
        act = {"tanh": nn.tanh, "relu": nn.relu, "gelu": nn.gelu}[
            self.activation]
        for i, w in enumerate(self.layers[:-1]):
            x = act(nn.Dense(w, name=f"fc{i}")(x))
        return nn.Dense(self.layers[-1], name=f"fc{len(self.layers) - 1}")(x)


class DeepONetCartesianProd(nn.Module):
    """out[b, n] = sum_p branch(u_b)_p * trunk(x_n)_p + bias.

    branch input: (B, n_sensors); trunk input: (N, coord_dim);
    output: (B, N)."""
    branch_layers: Sequence[int]
    trunk_layers: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, u_sensors, coords):
        assert self.branch_layers[-1] == self.trunk_layers[-1], \
            "branch and trunk must share the latent width p"
        b = _MLP(self.branch_layers, self.activation, name="branch")(
            u_sensors)
        t = _MLP(self.trunk_layers, self.activation, name="trunk")(coords)
        t = nn.tanh(t)
        bias = self.param("bias", nn.initializers.zeros, ())
        return jnp.einsum("bp,np->bn", b, t) + bias
