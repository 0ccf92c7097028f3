"""Iter-0 probe: loss components of the PINO PRETRAIN checkpoint on the
finetune trajectory, before any finetune updates.

Settles whether the finetune collapse (data rel-L2 -> 1.0, NOTES_r4) is a
data-pipeline mismatch (would show as data ~1.0 at iter 0) or genuine
training drift under the equation-only objective (starts at the pretrain
level ~0.5 and degrades).

Usage: python scripts/pino_finetune_probe.py [ckpt]
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from train_pino import build_model, load_or_generate
from pde_policylearning_tpu.ops.losses import SimpleLpLoss
from pde_policylearning_tpu.ops.pde_losses import get_forcing, pino_loss_3d
from pde_policylearning_tpu.training import load_msgpack
from pde_policylearning_tpu.utils import load_yaml


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "outputs/pino-pretrain.msgpack"
    cfg = load_yaml("configs/pino-observer-finetune-1s.yaml")
    dcfg = cfg["data"]
    ds = load_or_generate(dcfg, 1, offset=int(dcfg.get("train_offset", 64)))
    u, a, re = ds.arrays()
    model = build_model(cfg["model"])
    tmpl = jax.jit(model.init)(jax.random.PRNGKey(0), a[:1], re[:1])["params"]
    params = load_msgpack(ckpt, tmpl)

    lp = SimpleLpLoss(size_average=True)
    forcing = get_forcing(u.shape[1])
    t_interval = float(dcfg.get("t_duration", 1.0))

    @jax.jit
    def components(p, ab, ub, reb):
        out = model.apply({"params": p}, ab, reb).squeeze(-1)
        data_loss = lp(out, ub)
        u0 = ab[..., 0, -1]
        ic, f = pino_loss_3d(out, u0, forcing, 1.0 / reb, t_interval)
        return data_loss, ic, f

    d, ic, f = components(params, jnp.asarray(a), jnp.asarray(u),
                          jnp.asarray(re))
    print(f"iter-0 on finetune trajectory: data {float(d):.4f} "
          f"ic {float(ic):.4f} f {float(f):.4f}", flush=True)


if __name__ == "__main__":
    main()
