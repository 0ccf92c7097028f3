"""Graph feature extractors for the transformer models.

reference: libs/models/attention_layers.py:197 (GraphConvolution),
:245 (GraphAttention) and the GCN/GAT stacks used as optional transformer
feature extractors (transformer_models.py:592-604).

Dense-adjacency implementations (the reference likewise works with dense
(B, N, N) edge/Laplacian tensors).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class GraphConvolution(nn.Module):
    """x' = A (x W) + b over a dense adjacency/Laplacian
    (attention_layers.py:197)."""
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, edge):
        """x: (B, N, F); edge: (B, N, N) -> (B, N, out)."""
        support = nn.Dense(self.out_features, use_bias=self.use_bias,
                           name="w")(x)
        return jnp.einsum("bnm,bmf->bnf", edge, support)


class GCN(nn.Module):
    """Stack of graph convolutions with activation
    (attention_layers GCN wrapper)."""
    out_features: int
    num_layers: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, edge):
        act = {"relu": nn.relu, "silu": nn.silu, "gelu": nn.gelu}[
            self.activation]
        for i in range(self.num_layers):
            x = GraphConvolution(self.out_features, name=f"gc{i}")(x, edge)
            if i < self.num_layers - 1:
                x = act(x)
        return x


class GraphAttention(nn.Module):
    """Dense GAT layer (attention_layers.py:245): pairwise attention logits
    from concatenated projected features, masked by the graph."""
    out_features: int
    alpha: float = 1e-2
    graph_lap: bool = True
    interaction_thresh: float = 1e-6
    dropout: float = 0.1

    @nn.compact
    def __call__(self, node, adj, deterministic: bool = True):
        h = nn.Dense(self.out_features, use_bias=False,
                     kernel_init=nn.initializers.xavier_normal(),
                     name="W")(node)
        a = self.param("a", nn.initializers.xavier_normal(),
                       (2 * self.out_features, 1))
        a1, a2 = a[: self.out_features, 0], a[self.out_features:, 0]
        # e_ij = leakyrelu(a1.h_i + a2.h_j) without materializing pairs
        e = (h @ a1)[:, :, None] + (h @ a2)[:, None, :]
        e = nn.leaky_relu(e, negative_slope=self.alpha)
        if self.graph_lap:
            mask = jnp.abs(adj) > self.interaction_thresh
        else:
            mask = adj > 0
        e = jnp.where(mask, e, -9e15)
        attn = jax.nn.softmax(e, axis=-1)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout)(attn,
                                            deterministic=deterministic)
        return jnp.einsum("bnm,bmf->bnf", attn, h)


class GAT(nn.Module):
    """Stack of GAT layers (attention_layers GAT wrapper)."""
    out_features: int
    num_layers: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, adj, deterministic: bool = True):
        act = {"relu": nn.relu, "silu": nn.silu, "gelu": nn.gelu}[
            self.activation]
        for i in range(self.num_layers):
            x = GraphAttention(self.out_features, name=f"gat{i}")(
                x, adj, deterministic=deterministic)
            if i < self.num_layers - 1:
                x = act(x)
        return x
