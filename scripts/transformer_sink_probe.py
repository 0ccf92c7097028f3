"""Decompose the transformer-observer train-step cost on the real chip.

The base_transformer budget trains at ~136 ms/step (500-step epoch = 68 s);
at ~200 GFLOP/step that is ~7% of the v5e f32 roofline.  This probe times
(memoization-proof: scan over fresh PRNG inputs, ONE float fetch):
  - full train step (loss+grad+adam) at the base_transformer shape
  - value_and_grad only / forward only
  - forward with 0/1/8 encoder layers (encoder marginal cost)
  - regressor head only
  - one SpectralConv1dToken projection on (B, 2048, 96)

Shape: configs/base_transformer.yaml (B=20, T=2, 32x32, n_hidden 96,
8 encoder layers, fourier attention), cf. reference
libs/models/transformer_models.py:506-585.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import optax

from pde_policylearning_tpu.models.transformer import (
    SimpleTransformer, SpectralConv1dToken, SpectralRegressor)

B = int(os.environ.get("PROBE_B", 20))
T, H, W = 2, 32, 32
N_SCAN = int(os.environ.get("PROBE_N", 30))


def timed(fn, tag, shape, n=N_SCAN):
    @jax.jit
    def many(key):
        def body(c, k):
            x = jax.random.normal(k, shape)
            return c + fn(x), None
        out, _ = jax.lax.scan(body, 0.0, jax.random.split(key, n))
        return out
    float(many(jax.random.PRNGKey(11)))
    best = 1e9
    for seed in (12, 13, 14):
        t0 = time.perf_counter()
        float(many(jax.random.PRNGKey(seed)))
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f"{tag}: {best:.2f} ms", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)
    xs = (B, T, H, W, 1)

    def build(n_layers):
        m = SimpleTransformer(node_feats=1, n_hidden=96, n_head=2,
                              attention_type="fourier", fourier_modes=12,
                              freq_dim=48, num_encoder_layers=n_layers)
        p = jax.jit(m.init)(key, jnp.zeros(xs))["params"]
        return m, p

    model, params = build(8)
    opt = optax.adamw(1e-3, weight_decay=1e-4)
    opt_state = opt.init(params)

    def loss_fn(p, x):
        out = model.apply({"params": p}, x)
        return jnp.mean((out - x) ** 2)

    # full train step (captures params/opt_state as scan carry would)
    def train_step(x):
        loss, g = jax.value_and_grad(loss_fn)(params, x)
        updates, _ = opt.update(g, opt_state, params)
        p2 = optax.apply_updates(params, updates)
        return loss + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), p2, 0.0) * 0.0

    timed(train_step, "train step (grad+adam)", xs)
    timed(lambda x: jax.value_and_grad(loss_fn)(params, x)[0],
          "value_and_grad", xs)
    timed(lambda x: jnp.mean(model.apply({"params": params}, x)),
          "forward", xs)

    for nl in (0, 1):
        m, p = build(nl)
        timed(lambda x, m=m, p=p: jnp.mean(m.apply({"params": p}, x)),
              f"forward {nl} encoder layers", xs)

    reg = SpectralRegressor(n_hidden=96, freq_dim=48, out_dim=1, modes=12,
                            num_spectral_layers=3)
    rp = jax.jit(reg.init)(key, jnp.zeros((B * T, H, W, 96)))
    timed(lambda x: jnp.mean(reg.apply(rp, x)), "regressor only",
          (B * T, H, W, 96))

    proj = SpectralConv1dToken(96, modes=16, dropout=0.0)
    pp = jax.jit(proj.init)(key, jnp.zeros((B, T * H * W, 96)))
    timed(lambda x: jnp.mean(proj.apply(pp, x)), "one token projection",
          (B, T * H * W, 96))


if __name__ == "__main__":
    main()
