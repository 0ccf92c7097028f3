"""Non-degenerate test-time-adaptation probe (VERDICT r4 item 9).

Round-4 finding: the reference finetune objective (xy 0.0 -> pure ic+f
descent on ONE trajectory, configs/pino-observer-finetune-1s.yaml:46-48)
collapses the model because the time-FDM residual f has basins BELOW the
true solution's floor.  This probe tests the two principled rescues that
use only test-time-legal signals (no ground truth on the trajectory):

  A. early stopping at the residual floor: the floor is estimated from
     TRAINING trajectories (where truth is known) as mean f(u_true);
     descent stops when the trajectory's f reaches it.
  B. proximal descent: ic + f + mu * relL2(u, u_pretrain) — the pretrain
     prediction anchors the iterate to the data manifold.

For diagnosis the true-trajectory rel-L2 is logged the whole way (also
revealing the oracle-best the objective could ever deliver).

Usage: python scripts/tta_probe.py [ckpt] [iters]
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from train_pino import build_model, load_or_generate
from pde_policylearning_tpu.ops.losses import SimpleLpLoss
from pde_policylearning_tpu.ops.pde_losses import get_forcing, pino_loss_3d
from pde_policylearning_tpu.training import load_msgpack
from pde_policylearning_tpu.utils import load_yaml

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "outputs/pino-pretrain-bf16.msgpack"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
LOG_EVERY = 50
LR = 7.8125e-5   # the resumed-schedule operating point (NOTES_r4)

cfg = load_yaml("configs/pino-observer-finetune-1s.yaml")
dcfg = cfg["data"]
ds = load_or_generate(dcfg, 1, offset=int(dcfg.get("train_offset", 64)))
u, a, re = (jnp.asarray(x) for x in ds.arrays())
model = build_model(cfg["model"])
tmpl = jax.jit(model.init)(jax.random.PRNGKey(0), a[:1], re[:1])["params"]
params0 = load_msgpack(CKPT, tmpl)

lp = SimpleLpLoss(size_average=True)
forcing = get_forcing(u.shape[1])
t_interval = float(dcfg.get("t_duration", 1.0))


@jax.jit
def predict(p):
    return model.apply({"params": p}, a, re).squeeze(-1)


@jax.jit
def components(p):
    out = predict(p)
    u0 = a[..., 0, -1]
    ic, f = pino_loss_3d(out, u0, forcing, 1.0 / re, t_interval)
    return lp(out, u), ic, f


# residual floor from TRAINING trajectories (ground truth is legal there)
tr = load_or_generate(dcfg, 4, offset=0)
u_tr, a_tr, re_tr = (jnp.asarray(x) for x in tr.arrays())


@jax.jit
def f_of_truth(ub, ab, reb):
    u0 = ab[..., 0, -1]
    _, f = pino_loss_3d(ub, u0, forcing, 1.0 / reb, t_interval)
    return f


F_FLOOR = float(f_of_truth(u_tr, a_tr, re_tr))
d0, ic0, f0 = (float(x) for x in components(params0))
print(f"pretrain point: data {d0:.4f} ic {ic0:.4f} f {f0:.4f}; "
      f"train-estimated f floor {F_FLOOR:.4f}", flush=True)
out0 = predict(params0)   # frozen anchor for the proximal protocol


def run(mu):
    """mu=0 -> plain ic+f (reference objective); mu>0 -> proximal."""
    opt = optax.adam(LR)

    def loss_fn(p):
        out = model.apply({"params": p}, a, re).squeeze(-1)
        u0 = a[..., 0, -1]
        ic, f = pino_loss_3d(out, u0, forcing, 1.0 / re, t_interval)
        total = ic + f
        if mu:
            total = total + mu * lp(out, out0)
        return total, (ic, f)

    @jax.jit
    def chunk(p, s):
        def body(carry, _):
            p, s = carry
            (tot, (ic, f)), g = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(p)
            up, s = opt.update(g, s)
            return (optax.apply_updates(p, up), s), (tot, ic, f)
        (p, s), ms = jax.lax.scan(body, (p, s), None, length=LOG_EVERY)
        out = model.apply({"params": p}, a, re).squeeze(-1)
        return p, s, ms, lp(out, u)

    p, s = params0, opt.init(params0)
    series = []
    stop_iter, stop_rel = None, None
    for it in range(0, ITERS, LOG_EVERY):
        p, s, ms, rel = chunk(p, s)
        tot, ic, f = (float(x[-1]) for x in ms)
        rel = float(rel)
        series.append((it + LOG_EVERY, tot, ic, f, rel))
        if stop_iter is None and f <= F_FLOOR:
            stop_iter, stop_rel = it + LOG_EVERY, rel
        print(f"  mu={mu} iter {it + LOG_EVERY}: ic+f {tot:.4f} "
              f"ic {ic:.4f} f {f:.4f} | true-traj relL2 {rel:.4f}",
              flush=True)
    rels = [r for *_, r in series]
    best = min(rels)
    print(f"mu={mu}: final relL2 {rels[-1]:.4f}, oracle-best {best:.4f} "
          f"(pretrain {d0:.4f}); floor-stop "
          f"{'iter %d relL2 %.4f' % (stop_iter, stop_rel) if stop_iter else 'never reached'}",
          flush=True)
    return series


print("=== protocol: plain ic+f (reference objective) ===", flush=True)
run(0.0)
for mu in (1.0, 5.0):
    print(f"=== protocol: proximal mu={mu} ===", flush=True)
    run(mu)
