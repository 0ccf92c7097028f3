"""Clean-chip PINO train-iter timing at the r2 ledger shape (64^2x17 w64 b4)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax, jax.numpy as jnp, optax
from pde_policylearning_tpu.models.pino import PINObserver2d
from pde_policylearning_tpu.ops.losses import SimpleLpLoss
from pde_policylearning_tpu.ops.pde_losses import get_forcing, pino_loss_3d

B, S, T = 4, 64, 17
model = PINObserver2d(modes1=(8,)*4, modes2=(8,)*4, modes3=(8,)*4,
                      layers=(64,)*5, fc_dim=128, in_dim=4)
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (B, S, S, T, 4))
re = jnp.full((B,), 400.0)
params = jax.jit(model.init)(key, a, re)["params"]
lp = SimpleLpLoss(size_average=True)
forcing = get_forcing(S)
opt = optax.adam(1e-3)

def loss_fn(p, ab):
    o = model.apply({"params": p}, ab, re).squeeze(-1)
    dl = lp(o, ab[..., 3])
    ic, f = pino_loss_3d(o, ab[..., 0, 3], forcing, 1.0/re, 1.0)
    return 5*dl + ic + f

@jax.jit
def train_iters(p, s, key):
    def body(c, k):
        p, s = c
        ab = jax.random.normal(k, (B, S, S, T, 4))
        l, g = jax.value_and_grad(loss_fn)(p, ab)
        up, s = opt.update(g, s)
        return (optax.apply_updates(p, up), s), l
    (p, s), ls = jax.lax.scan(body, (p, s), jax.random.split(key, 50))
    return p, s, ls[-1]

s0 = opt.init(params)
_, _, l = train_iters(params, s0, jax.random.PRNGKey(1)); float(l)
best = 1e9
for seed in (2, 3, 4):
    t0 = time.perf_counter()
    _, _, l = train_iters(params, s0, jax.random.PRNGKey(seed)); float(l)
    best = min(best, (time.perf_counter()-t0)/50*1e3)
print(f"PINO train iter (64^2x17 w64 b4): {best:.1f} ms (min of 3x50; r2: 40.1)")

# --- component breakdown (clean chip): forward, grad, one spectral layer
def timed(fn, tag, n=50):
    @jax.jit
    def many(p, key):
        def body(c, k):
            ab = jax.random.normal(k, (B, S, S, T, 4))
            return c + fn(p, ab), None
        out, _ = jax.lax.scan(body, 0.0, jax.random.split(key, n))
        return out
    float(many(params, jax.random.PRNGKey(11)))
    best = 1e9
    for seed in (12, 13, 14):
        t0 = time.perf_counter(); float(many(params, jax.random.PRNGKey(seed)))
        best = min(best, (time.perf_counter()-t0)/n*1e3)
    print(f"{tag}: {best:.2f} ms")

timed(lambda p, ab: jnp.sum(model.apply({"params": p}, ab, re)), "forward only")
timed(lambda p, ab: loss_fn(p, ab), "forward+losses")
timed(lambda p, ab: jax.grad(loss_fn)(p, ab)["fc1"]["kernel"].sum(),
      "value+grad")

from pde_policylearning_tpu.ops.fourier import truncated_dft_conv_nd
# one w64 3-D spectral conv at the trunk shape
from pde_policylearning_tpu.ops import factorized
key2 = jax.random.PRNGKey(5)
wts = [factorized.init_factorized(jax.random.fold_in(key2, i),
                                  (64, 64, 8, 8, 8), "dense")
       for i in range(4)]
def layer_fwd(p, ab):
    return jnp.sum(truncated_dft_conv_nd(ab[..., :4].repeat(16, axis=-1),
                                         wts, (8, 8, 8)))
timed(layer_fwd, "one spectral layer fwd (incl 16x chan tile)")
def layer_grad(p, ab):
    x = ab[..., :4].repeat(16, axis=-1)
    f = lambda ws: jnp.sum(truncated_dft_conv_nd(x, ws, (8, 8, 8)) ** 2)
    g = jax.grad(f)(wts)
    return sum(jnp.sum(l) for l in jax.tree.leaves(g))
timed(layer_grad, "one spectral layer grad")
