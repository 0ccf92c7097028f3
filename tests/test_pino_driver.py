"""Driver-level test for train_pino.py — the finetune (TTA) protocol.

reference: train_pino.py:140-237 subprocess flow +
configs/pino-observer-finetune-1s.yaml (n_data_samples 1,
offset == testoffset, xy_loss 0: equation+IC finetune of ONE held-out
trajectory = test-time adaptation).
"""
import os
import runpy
import sys

import numpy as np
import yaml


def test_finetune_driver_tta(tmp_path, capsys, monkeypatch):
    cfg = {
        "seed": 0,
        "ckpt_dir": str(tmp_path),
        "ckpt_name": "finetune-smoke.msgpack",
        "data": {
            "paths": [str(tmp_path / "kf.npy")],
            "Re": 40,
            "raw_res": [16, 16, 3], "data_res": [16, 16, 3],
            "pde_res": [16, 16, 3],
            "n_samples": 1, "train_offset": 4,
            "n_test": 2, "test_offset": 4,
            "t_duration": 1.0,
        },
        "model": {
            "layers": [8, 8, 8], "modes1": [4, 4], "modes2": [4, 4],
            "modes3": [2, 2], "fc_dim": 16, "in_dim": 4, "out_dim": 1,
            "act": "gelu",
        },
        "train": {
            "batchsize": 1, "accum_steps": 1, "iterations": 2,
            "base_lr": 2.5e-3, "milestones": [1], "scheduler_gamma": 0.5,
            "xy_loss": 0.0, "ic_loss": 5.0, "f_loss": 1.0,
            "log_interval": 1,
        },
    }
    cfg_path = tmp_path / "finetune.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.setattr(sys, "argv",
                        ["train_pino.py", "--config", str(cfg_path)])
    runpy.run_path(os.path.join(os.path.dirname(__file__), os.pardir,
                                "train_pino.py"), run_name="__main__")
    out = capsys.readouterr().out

    # the equation-only finetune reports the TTA metric (rel-L2 on the
    # finetuned trajectory) and the held-out eval
    assert "finetuned-trajectory rel-L2" in out
    assert "eval rel-L2" in out
    assert os.path.exists(tmp_path / "finetune-smoke.msgpack")
    # the held-out split got its own cache (offset != 0 must not slice the
    # train cache) and covers both test samples
    off = np.load(str(tmp_path / "kf.npy") + ".off4.npy", mmap_mode="r")
    assert off.shape[0] >= 2
    tta = float(out.split("finetuned-trajectory rel-L2:")[1].split()[0])
    assert np.isfinite(tta)
