"""Decompose the PINO train-iter cost into its sinks on the real chip, and
A/B the spectral-conv backends (dft chained-tensordot vs dft_fused).

Measures (memoization-proof: scan over fresh PRNG inputs, ONE float fetch):
  - full train iter per backend (the VERDICT item-6 headline number)
  - forward / forward+losses / value+grad per backend
  - one spectral layer fwd + grad per backend
  - forward transform chain only, corner contraction only, inverse only
  - Adam update only
  - PDE residual loss only

Shape: the r2 perf-ledger point (64^2 x 17, w64, b4); reference budget in
configs/pino-observer-pretrain-1s.yaml (cf. reference train_3d.py:16).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import optax

from pde_policylearning_tpu.models.pino import PINObserver2d
from pde_policylearning_tpu.ops import factorized, fourier
from pde_policylearning_tpu.ops.losses import SimpleLpLoss
from pde_policylearning_tpu.ops.pde_losses import get_forcing, pino_loss_3d

B = int(os.environ.get("PROBE_B", 4))
S = int(os.environ.get("PROBE_S", 64))
T = int(os.environ.get("PROBE_T", 17))
W = int(os.environ.get("PROBE_W", 64))
N_SCAN = int(os.environ.get("PROBE_N", 50))
MODES = (8, 8, 8) if S >= 16 else (3, 3, 3)
# PROBE_DTYPE=bf16: run the forward (params + activations) in bf16 — the
# train_ns compute_dtype=bf16 configuration (losses/residual stay f32)
CDT = jnp.bfloat16 if os.environ.get("PROBE_DTYPE") == "bf16" else None


def timed(fn, tag, n=N_SCAN, args=()):
    @jax.jit
    def many(key, *a):
        def body(c, k):
            ab = jax.random.normal(k, (B, S, S, T, 4))
            return c + fn(ab, *a), None
        out, _ = jax.lax.scan(body, 0.0, jax.random.split(key, n))
        return out
    float(many(jax.random.PRNGKey(11), *args))
    best = 1e9
    for seed in (12, 13, 14):
        t0 = time.perf_counter()
        float(many(jax.random.PRNGKey(seed), *args))
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f"{tag}: {best:.2f} ms", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)
    model = PINObserver2d(modes1=MODES[0:1] * 4, modes2=MODES[1:2] * 4,
                          modes3=MODES[2:3] * 4, layers=(W,) * 5,
                          fc_dim=128, in_dim=4)
    a = jax.random.normal(key, (B, S, S, T, 4))
    re = jnp.full((B,), 400.0)
    params = jax.jit(model.init)(key, a, re)["params"]
    lp = SimpleLpLoss(size_average=True)
    forcing = get_forcing(S)
    opt = optax.adam(1e-3)
    s0 = opt.init(params)

    def loss_fn(p, ab):
        u0 = ab[..., 0, 3]
        tgt = ab[..., 3]
        reb = re
        if CDT is not None:
            p = jax.tree.map(lambda w: w.astype(CDT), p)
            ab = ab.astype(CDT)
            reb = re.astype(CDT)
        o = model.apply({"params": p}, ab, reb).squeeze(-1)
        o = o.astype(jnp.float32)
        dl = lp(o, tgt)
        ic, f = pino_loss_3d(o, u0, forcing, 1.0 / re, 1.0)
        return 5 * dl + ic + f

    # ---- full train iter (current default backend = dft via 'auto')
    def train_iter_time(tag):
        @jax.jit
        def train_iters(p, s, key):
            def body(c, k):
                p, s = c
                ab = jax.random.normal(k, (B, S, S, T, 4))
                l, g = jax.value_and_grad(loss_fn)(p, ab)
                up, s = opt.update(g, s)
                return (optax.apply_updates(p, up), s), l
            (p, s), ls = jax.lax.scan(body, (p, s),
                                      jax.random.split(key, N_SCAN))
            return p, s, ls[-1]
        _, _, l = train_iters(params, s0, jax.random.PRNGKey(1))
        float(l)
        best = 1e9
        for seed in (2, 3, 4):
            t0 = time.perf_counter()
            _, _, l = train_iters(params, s0, jax.random.PRNGKey(seed))
            float(l)
            best = min(best, (time.perf_counter() - t0) / N_SCAN * 1e3)
        print(f"{tag}: {best:.1f} ms (min of 3x50; r2 ledger: 40.1)",
              flush=True)
        return best

    import pde_policylearning_tpu.models.pino as pino_mod

    def with_backend(backend):
        """Patch SpectralConvND to route through `backend`."""
        orig = fourier.spectral_conv_nd

        def patched(x, ws, hm, **kw):
            kw["backend"] = backend
            return orig(x, ws, hm, **kw)
        return orig, patched

    for backend in ("dft", "dft_fused"):
        orig, patched = with_backend(backend)
        fourier.spectral_conv_nd = patched
        pino_mod.fourier.spectral_conv_nd = patched
        try:
            train_iter_time(f"train iter [{backend}]")

            def fwd_only(ab, p):
                reb = re
                if CDT is not None:
                    p = jax.tree.map(lambda w: w.astype(CDT), p)
                    ab, reb = ab.astype(CDT), re.astype(CDT)
                return jnp.sum(model.apply({"params": p}, ab, reb)
                               .astype(jnp.float32))
            timed(fwd_only, f"  forward only [{backend}]", args=(params,))
            timed(lambda ab, p: jax.grad(loss_fn)(p, ab)["fc1"]["kernel"].sum(),
                  f"  value+grad [{backend}]", args=(params,))
        finally:
            fourier.spectral_conv_nd = orig
            pino_mod.fourier.spectral_conv_nd = orig

    # ---- one spectral layer, isolated, per backend
    wts = [factorized.init_factorized(jax.random.fold_in(key, i),
                                      (W, W, *MODES), "dense")
           for i in range(4)]

    for backend in ("dft", "dft_fused"):
        timed(lambda ab, ws: jnp.sum(fourier.spectral_conv_nd(
                  ab[..., :4].repeat(W // 4, -1), ws, MODES, backend=backend)),
              f"  one spectral layer fwd [{backend}] (incl chan tile)",
              args=(wts,))
        timed(lambda ab, ws0: jax.tree.reduce(
            lambda a, b: a + b.sum(),
            jax.grad(lambda ws: jnp.sum(fourier.spectral_conv_nd(
                ab[..., :4].repeat(W // 4, -1), ws, MODES,
                backend=backend) ** 2))(ws0), 0.0),
            f"  one spectral layer grad-w [{backend}]", args=(wts,))

    # ---- stage decomposition of the fused path (forward transforms /
    # contraction / inverse) via manual staging
    dt = jnp.float32
    mats = [fourier._dft_mats(s, m, last, dt)
            for s, m, last in ((S, MODES[0], False), (S, MODES[1], False),
                               (T, MODES[2], True))]

    def fwd_chain(ab):
        x = ab[..., :4].repeat(W // 4, -1)
        CT, ST = mats[-1]
        hp = jax.lax.Precision.HIGHEST
        re = jnp.einsum("bqrtc,zt->bqrcz", x, CT, precision=hp)
        im = jnp.einsum("bqrtc,zt->bqrcz", x, ST, precision=hp)
        z = jnp.concatenate([re, im], axis=0)
        for k in (1, 0):
            Ck, Sk = mats[k]
            zc = jnp.tensordot(z, Ck, axes=[[k + 1], [1]], precision=hp)
            zs = jnp.tensordot(z, Sk, axes=[[k + 1], [1]], precision=hp)
            z = jnp.concatenate([zc[:B] - zs[B:], zs[:B] + zc[B:]], axis=0)
        return jnp.sum(z)
    timed(fwd_chain, "  fwd transform chain only [fused form]")

    # ---- Adam update only (67 M params, 7 HBM passes)
    grads = jax.tree.map(jnp.ones_like, params)

    def adam_only(ab, p, s):
        up, s2 = opt.update(grads, s)
        p2 = optax.apply_updates(p, up)
        return jax.tree.reduce(lambda a, b: a + b.sum(), p2, 0.0) * ab[0, 0, 0, 0, 0]
    timed(adam_only, "  adam update only", args=(params, s0))

    # ---- PDE residual loss only
    def pde_only(ab):
        o = ab[..., 3]
        ic, f = pino_loss_3d(o, ab[..., 0, 3], forcing, 1.0 / re, 1.0)
        return ic + f
    timed(pde_only, "  pde residual loss only")


if __name__ == "__main__":
    from pde_policylearning_tpu.utils import apply_env_platform
    apply_env_platform()
    main()
