"""Training A/B vs the ACTUAL reference implementation (VERDICT r3 item 1b).

Trains the reference torch `FNO2dObserver` (libs/models/fno_models.py:16,
loop = run_pde_observers.py:171-199 SequentialPDEDataset branch semantics)
and OUR flax observer on the IDENTICAL dataset, split, and budget, and
reports both best test rel-L2.  Reduced-but-converged budget (torch-CPU is
the only way to run the reference here): ntrain 1000 / ntest 200 /
100 epochs / batch 20 / Adam lr 1e-3 wd 1e-4 / StepLR(50, 0.5),
sequential split (random_split false) so both sides see the same samples.

Usage: python scripts/reference_ab_train.py [--epochs 100] [--skip-ref]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = "data/planes_channel180_minchan"
NTRAIN, NTEST = 1000, 200
SPLIT = "tail"  # "tail": test = last NTEST of the run (distribution-shifted
#                 far-future states); "interleaved": test = every 10th of
#                 the first 2000 steps (matches the reference protocol's
#                 random_split distribution)


def split_indices():
    if SPLIT == "tail":
        return np.arange(NTRAIN), np.arange(10000 - NTEST, 10000)
    idx = np.arange(0, 2000)
    test = idx[::10][:NTEST]
    train = np.setdiff1d(idx, test)[:NTRAIN]
    return train, test
BATCH = 20
LR, WD = 1e-3, 1e-4
STEP_SIZE, GAMMA = 50, 0.5


def load_planes(idx):
    p = np.stack([np.load(os.path.join(DATA, f"P_planes_{i:06d}.npy"))
                  for i in idx])
    v = np.stack([np.load(os.path.join(DATA, f"V_planes_{i:06d}.npy"))
                  for i in idx])
    return p.astype(np.float32), v.astype(np.float32)


def run_reference(epochs, seed=0):
    import torch
    sys.path.insert(0, "/root/repo/tests")
    from test_reference_parity import _install_shims
    _install_shims()
    sys.path.insert(0, "/root/reference")
    from libs.models.fno_models import FNO2dObserver
    from libs.utilities3 import LpLoss

    torch.manual_seed(seed)
    meta = np.load(os.path.join(DATA, "metadata.npy"),
                   allow_pickle=True).tolist()
    p_mean = torch.tensor(meta["P_planes"]["mean"], dtype=torch.float32)
    p_std = torch.tensor(meta["P_planes"]["std"], dtype=torch.float32)
    v_mean = torch.tensor(meta["V_planes"]["mean"], dtype=torch.float32)
    v_std = torch.tensor(meta["V_planes"]["std"], dtype=torch.float32)

    tr_idx, te_idx = split_indices()
    ptr, vtr = load_planes(tr_idx)
    pte, vte = load_planes(te_idx)
    ptr = (torch.tensor(ptr) - p_mean) / p_std
    pte = (torch.tensor(pte) - p_mean) / p_std
    vtr_n = (torch.tensor(vtr) - v_mean) / v_std
    vte_n = (torch.tensor(vte) - v_mean) / v_std

    model = FNO2dObserver(12, 12, 32, use_v_plane=False)
    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=STEP_SIZE,
                                            gamma=GAMMA)
    myloss = LpLoss(size_average=False)
    g = torch.Generator().manual_seed(seed)
    best = float("inf")
    for ep in range(epochs):
        model.train()
        perm = torch.randperm(NTRAIN, generator=g)
        t0 = time.time()
        tr_sum = 0.0
        for s in range(0, NTRAIN, BATCH):
            ib = perm[s:s + BATCH]
            x = ptr[ib].unsqueeze(-1)
            y = vtr_n[ib]
            opt.zero_grad()
            out = model(x, y.unsqueeze(-1)).reshape(len(ib), 32, 32)
            out_dec = out * v_std + v_mean
            y_dec = torch.tensor(vtr[ib.numpy()])
            loss = myloss(out_dec.view(len(ib), -1), y_dec.view(len(ib), -1))
            loss.backward()
            opt.step()
            tr_sum += loss.item()
        sched.step()
        model.eval()
        te_sum = 0.0
        with torch.no_grad():
            for s in range(0, NTEST, BATCH):
                x = pte[s:s + BATCH].unsqueeze(-1)
                out = model(x, vte_n[s:s + BATCH].unsqueeze(-1))
                out = out.reshape(x.shape[0], 32, 32)
                out_dec = out * v_std + v_mean
                y_dec = torch.tensor(vte[s:s + BATCH])
                te_sum += myloss(out_dec.view(x.shape[0], -1),
                                 y_dec.view(x.shape[0], -1)).item()
        te = te_sum / NTEST
        best = min(best, te)
        if (ep + 1) % 10 == 0:
            print(f"[torch ref] ep {ep + 1}/{epochs}: train "
                  f"{tr_sum / NTRAIN:.4f} test {te:.4f} best {best:.4f} "
                  f"({time.time() - t0:.1f}s/ep)", flush=True)
    return best


def run_ours(epochs, seed=0, torch_init=False):
    import jax
    if os.environ.get("AB_OURS_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    from pde_policylearning_tpu import models
    from pde_policylearning_tpu.data import PDEDataset
    from pde_policylearning_tpu.training import Trainer

    tr_idx, te_idx = split_indices()
    train_ds = PDEDataset.from_folder(DATA, tr_idx)
    test_ds = PDEDataset.from_folder(DATA, te_idx)
    x_train, y_train = train_ds.arrays()
    x_test, y_test = test_ds.arrays()
    model = models.FNO2dObserver(modes1=12, modes2=12, width=32)
    trainer = Trainer(model, n_epochs=epochs, batch_size=BATCH,
                      learning_rate=LR, weight_decay=WD,
                      step_size=STEP_SIZE, gamma=GAMMA,
                      decoder=train_ds.v_norm, log_interval=10,
                      # the reference trains on the batch-SUM rel-L2
                      # (LpLoss(size_average=False)): same Adam step, but
                      # a 1/batch-weaker coupled L2 decay than 'mean'
                      loss_reduction="sum")
    import jax as _jax
    params = None
    if torch_init:
        # start from the reference's init distribution (torch kaiming-
        # uniform Dense/conv + uniform bias), not flax's lecun-normal
        from pde_policylearning_tpu.training import torch_reinit
        params = jax.jit(model.init)(_jax.random.PRNGKey(seed),
                                     x_train[:1])["params"]
        params = torch_reinit(params, _jax.random.PRNGKey(seed + 1000))
    best_params, history = trainer.train((x_train, y_train),
                                         (x_test, y_test), params=params,
                                         rng=_jax.random.PRNGKey(seed))
    return float(history["best_loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--side", choices=["ours", "ref"], default=None)
    ap.add_argument("--split", choices=["tail", "interleaved"],
                    default="tail")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--torch-init", action="store_true",
                    help="ours side starts from the torch default init "
                         "distribution (training/torch_init.py)")
    args = ap.parse_args()
    global SPLIT
    SPLIT = args.split
    if args.side == "ours":
        print(f"RESULT {run_ours(args.epochs, args.seed, args.torch_init):.6f}")
        return
    if args.side == "ref":
        print(f"RESULT {run_reference(args.epochs, args.seed):.6f}")
        return
    # torch breaks when imported after jax in one process (inspect/fake-op
    # registration clash with the image's jax site hook): run each side in
    # its own subprocess
    import subprocess

    def side(name):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--side", name,
             "--epochs", str(args.epochs), "--split", args.split],
            capture_output=True, text=True)
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
        print(f"\n| framework | best test rel-L2 ({args.epochs} ep, "
              f"{NTRAIN}/{NTEST}) |")
        print("|---|---|")
        print(f"| reference (torch CPU) | {ref:.4f} |")
        print(f"| ours (JAX CPU) | {ours:.4f} |")


if __name__ == "__main__":
    main()
