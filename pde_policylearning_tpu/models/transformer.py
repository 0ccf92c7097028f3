"""Galerkin / Fourier transformer operator models.

reference: libs/models/transformer_models.py (SimpleTransformerEncoderLayer
:30, SimpleTransformer:506, FourierTransformer2D:672, DownScaler/UpScaler
:394,444) and libs/models/attention_layers.py (attention:636,
linear_attention:673, causal_linear_attn:699, freq_attention:580,
SimpleAttention:773, FeedForward:971, BulkRegressor:1007, positional
encodings:46-107, SpectralConv1d:1057).

TPU notes: all attention variants are einsums (MXU); the Galerkin/linear
forms are O(N d^2) — token count (T*H*W) never enters a softmax matrix.
Layout: tokens (B, N, C).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import factorized, fourier
from .rno import SpectralRegressor


# ---------------------------------------------------------------------------
# attention primitives
# ---------------------------------------------------------------------------

def attention(q, k, v, attention_type="softmax", mask=None):
    """Classic / Fourier (unnormalized integral) attention
    (attention_layers.py:636-670).  q,k,v: (B, H, N, D)."""
    d_k = q.shape[-1]
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(d_k)
    n = scores.shape[-1]
    if attention_type == "softmax":
        if mask is not None:
            scores = jnp.where(mask == 0, -1e9, scores)
        p = jax.nn.softmax(scores, axis=-1)
    else:  # 'fourier', 'integral', 'local': scores / seq_len
        if mask is not None:
            scores = jnp.where(mask == 0, 0.0, scores)
        p = scores / n
    out = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    return out, p


def linear_attention(q, k, v, attention_type="galerkin"):
    """Softmax-free Q (K^T V) / n (attention_layers.py:673-697)."""
    n = q.shape[-2]
    if attention_type in ("linear", "global"):
        q = jax.nn.softmax(q, axis=-1)
        k = jax.nn.softmax(k, axis=-2)
    kv = jnp.einsum("bhnd,bhne->bhde", k, v) / n
    out = jnp.einsum("bhnd,bhde->bhne", q, kv)
    return out, kv


def causal_linear_attention(q, k, v, eps=1e-7):
    """Causal linearized attention via cumulative sums
    (attention_layers.py:699-724)."""
    n = q.shape[-2]
    k = k / n
    kv = jnp.einsum("bhnd,bhne->bhnde", k, v)
    kv_cum = jnp.cumsum(kv, axis=2)
    k_cum = jnp.cumsum(k, axis=2)
    d_inv = 1.0 / (jnp.einsum("bhnd,bhnd->bhn", k_cum + eps, q))
    out = jnp.einsum("bhnd,bhnde,bhn->bhne", q, kv_cum, d_inv)
    return out, kv_cum


def freq_attention(q, k, v, attention_type="fourier", modes=16):
    """Attention computed in truncated rfft space over the token axis
    (attention_layers.py:580-633)."""
    n = q.shape[-2]
    d_k = q.shape[-1]

    def to_freq(x):
        xf = jnp.fft.rfft(jnp.swapaxes(x, -1, -2), n=n, norm="ortho")
        return jnp.swapaxes(xf[..., :modes], -1, -2)  # (B,H,modes,D)

    qf, kf, vf = to_freq(q), to_freq(k), to_freq(v)
    # NOTE: a plain (non-conjugated) complex product, matching the
    # reference's att_complex_matmul_1d (attention_layers.py:565-574,600)
    # which multiplies the stacked re/im parts without conjugation.
    scores = jnp.einsum("bhnd,bhmd->bhnm", qf, kf) / math.sqrt(d_k)
    if attention_type == "softmax":
        p = jax.nn.softmax(jnp.abs(scores), axis=-1).astype(scores.dtype)
    else:
        p = scores / n
    outf = jnp.einsum("bhnm,bhmd->bhnd", p, vf)
    outf = jnp.swapaxes(outf, -1, -2)
    out = jnp.fft.irfft(outf, n=n, norm="ortho")
    return jnp.swapaxes(out, -1, -2), p


def diag_dominant_init(xavier_gain: float = 1e-2,
                       diagonal_weight: float = 1e-2):
    """Xavier-uniform with small gain + added diagonal — the reference's
    attention-projection init (attention_layers.py:919-932
    _reset_parameters) that keeps Q/K/V near-identity at start."""
    base = nn.initializers.variance_scaling(
        xavier_gain, "fan_avg", "uniform")

    def init(key, shape, dtype=jnp.float32):
        w = base(key, shape, dtype)
        if len(shape) == 2 and diagonal_weight > 0:
            n = min(shape)
            w = w + diagonal_weight * jnp.eye(shape[0], shape[1], dtype=dtype)
        return w

    return init


class SpectralConv1dToken(nn.Module):
    """Linear residual + 1-D spectral conv over the token axis + SiLU —
    the QKV projection used by SimpleAttention (attention_layers.py:1057)."""
    out_dim: int
    modes: int = 16
    dropout: float = 0.1
    activation: str = "silu"

    @nn.compact
    def __call__(self, x, deterministic=True):
        res = nn.Dense(self.out_dim, name="linear",
                       kernel_init=diag_dominant_init())(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        m = min(self.modes, x.shape[-2] // 2 + 1)
        w = self.param(
            "w", lambda key: factorized.init_factorized(
                key, (x.shape[-1], self.out_dim, m), "dense",
                std=1.0 / (x.shape[-1] * self.out_dim)))
        conv = fourier.spectral_conv_nd(x, [w], (m,), fft_norm="ortho")
        out = conv + res
        act = nn.silu if self.activation == "silu" else nn.relu
        return act(out)


class SimpleAttention(nn.Module):
    """Multi-head attention whose projections are spectral conv layers and
    whose K/V (or Q/K) get per-head LayerNorm (attention_layers.py:773)."""
    n_head: int
    d_model: int
    attention_type: str = "fourier"
    pos_dim: int = 1
    dropout: float = 0.1
    norm: bool = False
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, query, key, value, pos=None, mask=None, weight=None,
                 deterministic=True):
        assert self.d_model % self.n_head == 0
        d_k = self.d_model // self.n_head
        bsz = query.shape[0]
        if weight is not None:
            query = weight * query
            key = weight * key

        def project(x, name):
            y = SpectralConv1dToken(self.d_model, name=name,
                                    dropout=self.dropout)(
                x, deterministic=deterministic)
            return jnp.swapaxes(
                y.reshape(bsz, -1, self.n_head, d_k), 1, 2)

        q = project(query, "proj_q")
        k = project(key, "proj_k")
        v = project(value, "proj_v")

        if self.norm:
            def head_norm(x, name):
                # per-head LayerNorm over the feature dim with per-head
                # affine params (the reference keeps one LayerNorm module
                # per head, attention_layers.py:963-969)
                mean = jnp.mean(x, axis=-1, keepdims=True)
                var = jnp.var(x, axis=-1, keepdims=True)
                xn = (x - mean) / jnp.sqrt(var + self.norm_eps)
                w = self.param(f"{name}_scale", nn.initializers.ones,
                               (self.n_head, 1, x.shape[-1]))
                b = self.param(f"{name}_bias", nn.initializers.zeros,
                               (self.n_head, 1, x.shape[-1]))
                return xn * w + b
            if self.attention_type in ("linear", "galerkin", "global"):
                k = head_norm(k, "norm_K")
                v = head_norm(v, "norm_V")
            else:
                k = head_norm(k, "norm_K")
                q = head_norm(q, "norm_Q")

        if pos is not None and self.pos_dim > 0:
            p = jnp.broadcast_to(pos[:, None],
                                 (bsz, self.n_head, *pos.shape[1:]))
            q, k, v = [jnp.concatenate([p, x], axis=-1) for x in (q, k, v)]

        if self.attention_type in ("linear", "galerkin", "global"):
            x, attn = linear_attention(q, k, v, self.attention_type)
        elif self.attention_type == "causal":
            x, attn = causal_linear_attention(q, k, v)
        elif self.attention_type == "freq":
            x, attn = freq_attention(q, k, v)
        elif self.attention_type in ("fourier", "integral", "local") and \
                mask is None:
            # The reference computes (QK^T/(sqrt(d)n))V with NO softmax
            # between the matmuls (attention_layers.py:636-670), so
            # associativity gives the identical result as Q(K^T V) — an
            # O(N d^2) contraction instead of materializing the O(N^2)
            # score tensor (the dominant HBM cost at N=2048 tokens).
            dk = q.shape[-1]
            n = q.shape[-2]
            kv = jnp.einsum("bhnd,bhne->bhde", k, v)
            x = jnp.einsum("bhnd,bhde->bhne", q, kv) / (math.sqrt(dk) * n)
            attn = kv
        else:
            x, attn = attention(q, k, v, self.attention_type, mask=mask)

        out_d = x.shape[1] * x.shape[-1]
        out = jnp.swapaxes(x, 1, 2).reshape(bsz, -1, out_d)
        if pos is not None and self.pos_dim > 0:
            out = nn.Dense(self.d_model, name="fc")(out)
        return out, attn


class FeedForward(nn.Module):
    """2-layer MLP (attention_layers.py:971)."""
    dim_feedforward: int = 1024
    out_dim: Optional[int] = None
    activation: str = "relu"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        out_dim = self.out_dim or x.shape[-1]
        act = {"relu": nn.relu, "silu": nn.silu, "gelu": nn.gelu}[
            self.activation]
        x = nn.Dense(self.dim_feedforward, name="lr1")(x)
        x = act(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(out_dim, name="lr2")(x)


def positional_encoding(n: int, d_model: int):
    """Sinusoidal PE (attention_layers.py:46-63)."""
    pos = np.arange(n)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((n, d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: (d_model - d_model // 2)])
    return jnp.asarray(pe)


class SimpleTransformerEncoderLayer(nn.Module):
    """attn -> residual [+LN] -> FFN -> residual [+LN]
    (transformer_models.py:30-150)."""
    d_model: int = 96
    n_head: int = 2
    pos_dim: int = 1
    dim_feedforward: int = 512
    attention_type: str = "fourier"
    layer_norm: bool = True
    attn_norm: Optional[bool] = None
    pos_emb: bool = False
    residual_type: str = "add"
    activation_type: str = "relu"
    dropout: float = 0.1
    ffn_dropout: Optional[float] = None
    norm_eps: float = 1e-5  # torch LayerNorm default (transformer_models
    # uses it for both post-norms; flax's 1e-6 default would diverge)

    @nn.compact
    def __call__(self, x, pos=None, weight=None, deterministic=True):
        attn_norm = self.attn_norm
        if attn_norm is None:
            attn_norm = not self.layer_norm
        if self.pos_emb:
            x = x + positional_encoding(x.shape[1],
                                        self.d_model)[None].astype(x.dtype)
        att_output, attn_weight = SimpleAttention(
            n_head=self.n_head, d_model=self.d_model,
            attention_type=self.attention_type, pos_dim=self.pos_dim
            if pos is not None else 0,
            dropout=self.dropout, norm=attn_norm, name="attn")(
            x, x, x, pos=pos, weight=weight, deterministic=deterministic)
        if self.dropout > 0:
            att_output = nn.Dropout(self.dropout)(att_output,
                                                  deterministic=deterministic)
        if self.residual_type in ("add", "plus") or self.residual_type is \
                None:
            x = x + att_output
        else:
            x = x - att_output
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=self.norm_eps, name="layer_norm1")(x)
        x1 = FeedForward(dim_feedforward=self.dim_feedforward,
                         activation=self.activation_type,
                         dropout=self.ffn_dropout or self.dropout,
                         name="ff")(x, deterministic=deterministic)
        if self.dropout > 0:
            x1 = nn.Dropout(self.dropout)(x1, deterministic=deterministic)
        x = x + x1
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=self.norm_eps, name="layer_norm2")(x)
        return x, attn_weight


class BulkRegressor(nn.Module):
    """Per-target bulk sequence regressor (attention_layers.py:1007)."""
    n_targets: int
    pred_len: int
    sort_output: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, N, C) -> (B, pred_len, n_targets)
        x = nn.Dense(self.n_targets, name="linear")(x)  # (B, N, T)
        x = jnp.swapaxes(x, -1, -2)                     # (B, T, N)
        out = nn.Dense(self.pred_len, name="regressor")(x)
        out = jnp.swapaxes(out, -1, -2)
        if self.sort_output:
            out = jnp.sort(out, axis=-1)
        return out


class SimpleTransformer(nn.Module):
    """Sequence-to-field operator transformer (transformer_models.py:506):
    flatten (T, H, W) to tokens -> feature lift -> `num_encoder_layers`
    encoder layers -> spectral (IFFT) regressor on the spatial grid.

    The reference hardcodes num_encoder_layers=8 and num_regressor_layers=3
    (transformer_models.py:583-585); both are configurable here with those
    defaults.
    """
    node_feats: int = 1
    n_hidden: int = 96
    n_head: int = 2
    n_targets: int = 1
    pos_dim: int = 1
    freq_dim: int = 48
    fourier_modes: int = 12
    num_encoder_layers: int = 8
    num_regressor_layers: int = 3
    attention_type: str = "fourier"
    layer_norm: bool = True
    spacial_residual: bool = False
    dim_feedforward: Optional[int] = None
    dropout: float = 0.05
    decoder_dropout: float = 0.0
    regressor_activation: str = "silu"
    feat_extract_type: Optional[str] = None  # None | 'gcn' | 'gat'
    num_feat_layers: int = 2

    @nn.compact
    def __call__(self, node, v_plane=None, pos=None, grid=None, weight=None,
                 edge=None, deterministic=True):
        """node: (B, T, H, W, D) -> (B, T, H, W, n_targets)."""
        B, T, H, W, D = node.shape
        x = node.reshape(B, -1, D)
        if self.feat_extract_type == "gcn" and edge is not None:
            from .graph import GCN
            x = GCN(self.n_hidden, self.num_feat_layers,
                    name="feat_extract")(x, edge)
        elif self.feat_extract_type == "gat" and edge is not None:
            from .graph import GAT
            x = GAT(self.n_hidden, self.num_feat_layers,
                    name="feat_extract")(x, edge,
                                         deterministic=deterministic)
        else:
            x = nn.Dense(self.n_hidden, name="feat_extract")(x)
        res = x
        dimff = self.dim_feedforward or 2 * self.n_hidden
        for i in range(self.num_encoder_layers):
            x, _ = SimpleTransformerEncoderLayer(
                d_model=self.n_hidden, n_head=self.n_head,
                pos_dim=self.pos_dim, dim_feedforward=dimff,
                attention_type=self.attention_type,
                layer_norm=self.layer_norm, dropout=self.dropout,
                name=f"encoder{i}")(x, pos=pos, weight=weight,
                                    deterministic=deterministic)
        if self.spacial_residual:
            x = res + x
        # decode on the spatial grid per timestep (decoder_type='ifft')
        x = x.reshape(B * T, H, W, self.n_hidden)
        x = SpectralRegressor(
            n_hidden=self.n_hidden, freq_dim=self.freq_dim,
            out_dim=self.n_targets, modes=self.fourier_modes,
            num_spectral_layers=self.num_regressor_layers,
            activation=self.regressor_activation,
            dropout=self.decoder_dropout, name="regressor")(
            x, deterministic=deterministic)
        return x.reshape(B, T, H, W, self.n_targets)


class Conv2dResBlock(nn.Module):
    """conv -> act -> conv + residual (attention_layers.py:132)."""
    out_dim: int
    activation: str = "silu"

    @nn.compact
    def __call__(self, x):
        act = {"relu": nn.relu, "silu": nn.silu}[self.activation]
        res = x if x.shape[-1] == self.out_dim else nn.Dense(
            self.out_dim, name="proj")(x)
        h = nn.Conv(self.out_dim, (3, 3), padding=1, name="conv1")(x)
        h = act(h)
        h = nn.Conv(self.out_dim, (3, 3), padding=1, name="conv2")(h)
        return act(h + res)


class DownScaler(nn.Module):
    """Conv-res-block + interpolation down-scaling
    (transformer_models.py:394)."""
    out_dim: int
    scale_factor: float = 0.5

    @nn.compact
    def __call__(self, x):
        x = Conv2dResBlock(self.out_dim, name="conv")(x)
        B, H, W, C = x.shape
        new = (B, int(round(H * self.scale_factor)),
               int(round(W * self.scale_factor)), C)
        return jax.image.resize(x, new, "bilinear")


class UpScaler(nn.Module):
    """Interpolation + conv up-scaling (transformer_models.py:444)."""
    out_dim: int
    scale_factor: float = 2.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        new = (B, int(round(H * self.scale_factor)),
               int(round(W * self.scale_factor)), C)
        x = jax.image.resize(x, new, "bilinear")
        x = nn.Conv(self.out_dim, (3, 3), padding=1, name="conv")(x)
        return nn.silu(x)


class FourierTransformer2D(nn.Module):
    """2-D encoder-decoder transformer: downscale -> encoder stack ->
    upscale -> spectral regressor (transformer_models.py:672)."""
    node_feats: int = 3
    n_hidden: int = 96
    n_head: int = 2
    n_targets: int = 1
    pos_dim: int = 2
    freq_dim: int = 48
    fourier_modes: int = 12
    num_encoder_layers: int = 4
    num_regressor_layers: int = 2
    attention_type: str = "galerkin"
    downscale_factor: float = 0.5
    dropout: float = 0.05

    @nn.compact
    def __call__(self, node, pos=None, grid=None, weight=None,
                 deterministic=True):
        """node: (B, H, W, D) -> (B, H, W, n_targets)."""
        B, H, W, D = node.shape
        x = DownScaler(self.n_hidden, self.downscale_factor,
                       name="downscaler")(node)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(B, -1, self.n_hidden)
        for i in range(self.num_encoder_layers):
            x, _ = SimpleTransformerEncoderLayer(
                d_model=self.n_hidden, n_head=self.n_head,
                pos_dim=self.pos_dim if pos is not None else 0,
                dim_feedforward=2 * self.n_hidden,
                attention_type=self.attention_type, dropout=self.dropout,
                name=f"encoder{i}")(x, pos=pos,
                                    deterministic=deterministic)
        x = x.reshape(B, h, w, self.n_hidden)
        x = UpScaler(self.n_hidden, 1.0 / self.downscale_factor,
                     name="upscaler")(x)
        if x.shape[1] != H or x.shape[2] != W:
            x = jax.image.resize(x, (B, H, W, self.n_hidden), "bilinear")
        x = SpectralRegressor(
            n_hidden=self.n_hidden, freq_dim=self.freq_dim,
            out_dim=self.n_targets, modes=self.fourier_modes,
            num_spectral_layers=self.num_regressor_layers,
            name="regressor")(x, deterministic=deterministic)
        return x


FourierTransformer2DLite = FourierTransformer2D  # lighter hyperparameters
