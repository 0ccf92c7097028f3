"""Training A/B vs the ACTUAL reference implementation (VERDICT r3 item 1b,
extended to the sequence observers in round 4 — VERDICT r4 item 5).

Trains the reference torch observer (FNO2dObserver / RNO2d / SimpleTransformer,
loop = run_pde_observers.py:171-199 SequentialPDEDataset branch semantics) and
OUR flax observer on the IDENTICAL dataset, split, and budget, and reports both
best test rel-L2.  torch-CPU is the only way to run the reference here.

Budgets:
  fno          ntrain 1000 / ntest 200 planes, 100 ep, b20 (reduced base_fno)
  rno          the full reference matlab_rno budget: ntrain 280 / ntest 20
               planes (T=2 -> 140/10 sequences), 100 ep, b32, width 34,
               layer_num 1, recurrent_index 0, sequential split
               (matlab_rno.yaml random_split: false); dropout 0.3 active in
               the regressor on both sides (reference model.train() mode)
  transformer  reference base_transformer model dict (8 encoder layers
               hardcoded at transformer_models.py:583-585, n_head 1,
               dim_feedforward 192, fourier attention, ifft decoder), reduced
               budget ntrain 1000 / ntest 200 planes (T=2 -> 500/100 seqs),
               30 ep, b20

Both sides use the reference init distribution (ours via
training/torch_init.py with model-specific exclusions for params whose
reference init is custom and already mirrored by our flax init) and the
reference's LpLoss(size_average=False) batch-SUM training gradient.

Usage: python scripts/reference_ab_train.py --model rno --seed 0
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = "data/planes_channel180_minchan"

BUDGETS = {
    # ntrain/ntest in PLANES; T = sequence length (1 = plain)
    "fno": dict(ntrain=1000, ntest=200, epochs=100, batch=20, T=1,
                lr=1e-3, wd=1e-4, step_size=50, gamma=0.5),
    "rno": dict(ntrain=280, ntest=20, epochs=100, batch=32, T=2,
                lr=1e-3, wd=1e-4, step_size=100, gamma=0.5),
    "transformer": dict(ntrain=1000, ntest=200, epochs=30, batch=20, T=2,
                        lr=1e-3, wd=1e-4, step_size=100, gamma=0.5),
}
SPLIT = "tail"


def split_indices(model):
    b = BUDGETS[model]
    ntrain, ntest = b["ntrain"], b["ntest"]
    if model == "rno":
        # matlab_rno.yaml random_split: false -> sequential indices
        return np.arange(ntrain), np.arange(ntrain, ntrain + ntest)
    if SPLIT == "tail":
        return np.arange(ntrain), np.arange(10000 - ntest, 10000)
    idx = np.arange(0, 2000)
    test = idx[::10][:ntest]
    train = np.setdiff1d(idx, test)[:ntrain]
    return train, test


def load_planes(idx):
    p = np.stack([np.load(os.path.join(DATA, f"P_planes_{i:06d}.npy"))
                  for i in idx])
    v = np.stack([np.load(os.path.join(DATA, f"V_planes_{i:06d}.npy"))
                  for i in idx])
    return p.astype(np.float32), v.astype(np.float32)


def load_norms_np():
    meta = np.load(os.path.join(DATA, "metadata.npy"),
                   allow_pickle=True).tolist()
    return (meta["P_planes"]["mean"], meta["P_planes"]["std"],
            meta["V_planes"]["mean"], meta["V_planes"]["std"])


def build_reference_model(model_name):
    """Construct the reference torch model exactly as
    run_pde_observers.py:98-113 does (RNO2dObserver is an argument-passing
    subclass of neuralop RNO2d, rno_models.py:12-15, whose module has a
    broken import — we use the parent directly)."""
    if model_name == "fno":
        from libs.models.fno_models import FNO2dObserver
        return FNO2dObserver(12, 12, 32, use_v_plane=False)
    if model_name == "rno":
        from neuralop.models.rno import RNO2d
        return RNO2d(12, 12, 34, recurrent_index=0, layer_num=1)
    from libs.models.transformer_models import SimpleTransformer
    # reference base_transformer.yaml model dict (8 encoder layers are
    # hardcoded inside SimpleTransformer, transformer_models.py:583-585)
    return SimpleTransformer(
        node_feats=1, edge_feats=None, pos_dim=1, n_targets=1, n_hidden=96,
        num_feat_layers=0, num_encoder_layers=4, n_head=1, pred_len=0,
        n_freq_targets=0, dim_feedforward=192, feat_extract_type=None,
        attention_type="fourier", xavier_init=0.001, diagonal_weight=0.01,
        symmetric_init=False, layer_norm=False, attn_norm=True,
        batch_norm=False, spacial_residual=False, return_attn_weight=False,
        return_latent=False, residual_type="plus", seq_len=None,
        bulk_regression=False, decoder_type="ifft", freq_dim=48,
        num_regressor_layers=2, fourier_modes=16, spacial_dim=1,
        spacial_fc=False, dropout=0.0, encoder_dropout=0.0, ffn_dropout=0.0,
        decoder_dropout=0.0, debug=False)


def run_reference(model_name, epochs, seed=0):
    import torch
    sys.path.insert(0, "/root/repo/tests")
    from test_reference_parity import _install_shims
    _install_shims()
    sys.path.insert(0, "/root/reference")
    from libs.utilities3 import LpLoss

    b = BUDGETS[model_name]
    T, batch = b["T"], b["batch"]
    torch.manual_seed(seed)
    p_mean_np, p_std_np, v_mean_np, v_std_np = load_norms_np()
    p_mean = torch.tensor(p_mean_np, dtype=torch.float32)
    p_std = torch.tensor(p_std_np, dtype=torch.float32)
    v_mean = torch.tensor(v_mean_np, dtype=torch.float32)
    v_std = torch.tensor(v_std_np, dtype=torch.float32)

    tr_idx, te_idx = split_indices(model_name)
    ptr, vtr = load_planes(tr_idx)
    pte, vte = load_planes(te_idx)
    ptr_n = (torch.tensor(ptr) - p_mean) / p_std
    pte_n = (torch.tensor(pte) - p_mean) / p_std
    vtr_n = (torch.tensor(vtr) - v_mean) / v_std
    vte_n = (torch.tensor(vte) - v_mean) / v_std

    if T > 1:  # (N, H, W) -> (Nseq, T, H, W)
        def seq(x):
            n = (x.shape[0] // T) * T
            return x[:n].reshape(-1, T, *x.shape[1:])
        ptr_n, pte_n = seq(ptr_n), seq(pte_n)
        vtr_n, vte_n = seq(vtr_n), seq(vte_n)

    model = build_reference_model(model_name)
    opt = torch.optim.Adam(model.parameters(), lr=b["lr"],
                           weight_decay=b["wd"])
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=b["step_size"],
                                            gamma=b["gamma"])
    myloss = LpLoss(size_average=False)
    g = torch.Generator().manual_seed(seed)
    n_seq = ptr_n.shape[0]
    n_te = pte_n.shape[0]
    best = float("inf")

    def fwd(p_in, v_in):
        """run_pde_observers.py:171-199 branch semantics per model."""
        if model_name == "fno":
            out = model(p_in.unsqueeze(-1), v_in.unsqueeze(-1))
            return out.reshape(p_in.shape[0], 32, 32), v_in
        if model_name == "rno":
            target = v_in[:, 0]  # recurrent_index 0
            out = model(p_in.unsqueeze(-1), target.unsqueeze(-1))
            return out.reshape(p_in.shape[0], 32, 32), target
        # transformer: predicts every timestep, loss over the sequence
        out = model(p_in.unsqueeze(-1), v_in.unsqueeze(-1))
        if isinstance(out, dict):
            out = out["preds"]
        return out.reshape(*v_in.shape), v_in

    for ep in range(epochs):
        model.train()
        perm = torch.randperm(n_seq, generator=g)
        # drop_last both sides so each side sees the same samples/epoch
        steps = n_seq // batch
        t0 = time.time()
        tr_sum, tr_n = 0.0, 0
        for s in range(steps):
            ib = perm[s * batch:(s + 1) * batch]
            opt.zero_grad()
            out, target = fwd(ptr_n[ib], vtr_n[ib])
            out_dec = out * v_std + v_mean
            y_dec = target * v_std + v_mean
            loss = myloss(out_dec.reshape(len(ib), -1),
                          y_dec.reshape(len(ib), -1))
            loss.backward()
            opt.step()
            tr_sum += loss.item()
            tr_n += len(ib)
        sched.step()
        model.eval()
        te_sum, te_n = 0.0, 0
        with torch.no_grad():
            for s in range(0, n_te, batch):
                out, target = fwd(pte_n[s:s + batch], vte_n[s:s + batch])
                out_dec = out * v_std + v_mean
                y_dec = target * v_std + v_mean
                te_sum += myloss(out_dec.reshape(out.shape[0], -1),
                                 y_dec.reshape(out.shape[0], -1)).item()
                te_n += out.shape[0]
        te = te_sum / te_n
        best = min(best, te)
        if (ep + 1) % 10 == 0 or ep == epochs - 1:
            print(f"[torch ref {model_name}] ep {ep + 1}/{epochs}: train "
                  f"{tr_sum / max(tr_n, 1):.4f} test {te:.4f} best {best:.4f} "
                  f"({time.time() - t0:.1f}s/ep)", flush=True)
    return best


def build_our_model(model_name):
    from pde_policylearning_tpu import models
    if model_name == "fno":
        return models.FNO2dObserver(modes1=12, modes2=12, width=32)
    if model_name == "rno":
        return models.RNO2dObserver(modes1=12, modes2=12, width=34,
                                    layer_num=1)
    # matches the reference model dict AFTER its hardcoded overrides
    # (transformer_models.py:583-585: 8 encoder / 3 regressor layers)
    return models.SimpleTransformer(
        n_hidden=96, n_head=1, dim_feedforward=192,
        attention_type="fourier", layer_norm=False, freq_dim=48,
        fourier_modes=16, num_regressor_layers=3, num_encoder_layers=8,
        dropout=0.0, decoder_dropout=0.0)


# params whose reference init is custom and already mirrored by flax init
TORCH_REINIT_EXCLUDE = {
    "fno": (),
    # input-projection kernel: normal(std=1) on both sides (rno.py:311-312)
    "rno": ("input_projection/kernel",),
    # QKV projection kernels: xavier(1e-3)+0.01*I on both sides
    # (attention_layers.py _reset_parameters / our diag_dominant_init)
    "transformer": ("proj_q/linear/kernel", "proj_k/linear/kernel",
                    "proj_v/linear/kernel"),
}


def run_ours(model_name, epochs, seed=0, torch_init=True):
    import jax
    if os.environ.get("AB_OURS_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pde_policylearning_tpu.ops.normalization import \
        NormalizerGivenMeanStd
    from pde_policylearning_tpu.training import Trainer

    b = BUDGETS[model_name]
    T = b["T"]
    p_mean, p_std, v_mean, v_std = load_norms_np()
    p_norm = NormalizerGivenMeanStd(jnp.asarray(p_mean), jnp.asarray(p_std))
    v_norm = NormalizerGivenMeanStd(jnp.asarray(v_mean), jnp.asarray(v_std))

    tr_idx, te_idx = split_indices(model_name)
    ptr, vtr = load_planes(tr_idx)
    pte, vte = load_planes(te_idx)

    def prep(p, v):
        p = p_norm.encode(jnp.asarray(p))[..., None]
        v = v_norm.encode(jnp.asarray(v))[..., None]
        if T > 1:
            n = (p.shape[0] // T) * T
            p = p[:n].reshape(-1, T, *p.shape[1:])
            v = v[:n].reshape(-1, T, *v.shape[1:])
        return p, v

    x_train, y_train = prep(ptr, vtr)
    x_test, y_test = prep(pte, vte)
    if model_name == "rno":  # target = v at recurrent_index 0
        y_train, y_test = y_train[:, 0], y_test[:, 0]

    model = build_our_model(model_name)
    # dropout active at train time where the reference has it (the RNO
    # regressor's hardwired 0.3, rno.py:317-318); the transformer config
    # sets every dropout to 0 so this is a no-op there
    train_kwargs = {"deterministic": False} if model_name == "rno" else None
    trainer = Trainer(model, n_epochs=epochs, batch_size=b["batch"],
                      learning_rate=b["lr"], weight_decay=b["wd"],
                      step_size=b["step_size"], gamma=b["gamma"],
                      decoder=v_norm, log_interval=10,
                      loss_reduction="sum",
                      train_model_kwargs=train_kwargs)
    params = None
    if torch_init:
        from pde_policylearning_tpu.training import torch_reinit
        params = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                     x_train[:1])["params"]
        params = torch_reinit(params, jax.random.PRNGKey(seed + 1000),
                              exclude=TORCH_REINIT_EXCLUDE[model_name])
    best_params, history = trainer.train((x_train, y_train),
                                         (x_test, y_test), params=params,
                                         rng=jax.random.PRNGKey(seed))
    return float(history["best_loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["fno", "rno", "transformer"],
                    default="fno")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--side", choices=["ours", "ref"], default=None)
    ap.add_argument("--split", choices=["tail", "interleaved"],
                    default="tail")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stock-init", action="store_true",
                    help="ours side keeps the flax default init instead of "
                         "the torch-matched redraw")
    args = ap.parse_args()
    global SPLIT
    SPLIT = args.split
    epochs = args.epochs or BUDGETS[args.model]["epochs"]
    if args.side == "ours":
        r = run_ours(args.model, epochs, args.seed,
                     torch_init=not args.stock_init)
        print(f"RESULT {r:.6f}")
        return
    if args.side == "ref":
        print(f"RESULT {run_reference(args.model, epochs, args.seed):.6f}")
        return
    # torch breaks when imported after jax in one process (inspect/fake-op
    # registration clash with the image's jax site hook): run each side in
    # its own subprocess
    import subprocess

    def side(name):
        cmd = [sys.executable, os.path.abspath(__file__), "--side", name,
               "--model", args.model, "--epochs", str(epochs),
               "--split", args.split, "--seed", str(args.seed)]
        if args.stock_init:
            cmd.append("--stock-init")
        out = subprocess.run(cmd, capture_output=True, text=True)
        sys.stdout.write(out.stdout)
        if out.returncode:
            sys.stderr.write(out.stderr[-3000:])
            raise SystemExit(f"{name} side failed")
        return float(out.stdout.strip().splitlines()[-1].split()[-1])

    ours = side("ours")
    print(f"\nOURS      best test rel-L2: {ours:.4f}", flush=True)
    if not args.skip_ref:
        ref = side("ref")
        print(f"REFERENCE best test rel-L2: {ref:.4f}")
        b = BUDGETS[args.model]
        print(f"\n| framework | best test rel-L2 ({args.model}, {epochs} ep, "
              f"{b['ntrain']}/{b['ntest']} planes, seed {args.seed}) |")
        print("|---|---|")
        print(f"| reference (torch CPU) | {ref:.4f} |")
        print(f"| ours (JAX CPU) | {ours:.4f} |")


if __name__ == "__main__":
    main()
