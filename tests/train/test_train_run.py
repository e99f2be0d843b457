"""End-to-end ``train.run()`` smoke on tiny synthetic data, pinning the
validation-aggregation contract: ``val_loss`` is a mean over validation
batches, INDEPENDENT of whether the per-utterance quality scorer succeeds
(reference analog train.py:301-404).  Regression test for the r4 bug where
``n_utts == 0`` collapsed the divisor to 1 (val_loss became a sum) and an
empty valid loader left the batch index unbound."""

import json
import os

import numpy as np
import pytest


def _make_cfg(tmp_path, exp_name):
    from gtcrn_micro_tpu.utils.config import _wrap

    root = str(tmp_path / "data")
    return root, _wrap({
        "network": "gtcrn_micro",
        "network_config": {"n_fft": 512, "hop_len": 256, "win_len": 512},
        "seed": 43,
        "scheduler": {"kwargs": {"warmup_steps": 4, "decay_until_step": 40,
                                 "max_lr": 1e-3, "min_lr": 1e-6}},
        "loss": {"compress_factor": 0.3, "lamda_ri": 30, "lamda_mag": 70},
        "train_dataset": {"noisy_root": os.path.join(root, "train", "noisy"),
                          "fs": 16000, "length_seconds": 1.0,
                          "num_data_per_epoch": 8, "train": True},
        "train_dataloader": {"batch_size": 8, "num_workers": 1},
        "valid_dataset": {"noisy_root": os.path.join(root, "val", "noisy"),
                          "fs": 16000, "length_seconds": 1.0, "train": False},
        "valid_dataloader": {"batch_size": 1, "num_workers": 1},
        "trainer": {"epochs": 1, "save_checkpoint_interval": 1,
                    "clip_grad_norm": 3.0,
                    "exp_path": str(tmp_path / exp_name), "resume": False,
                    "log_every": 1},
    })


def _read_val_metrics(exp_path):
    lines = [json.loads(ln) for ln in
             open(os.path.join(exp_path, "logs", "metrics.jsonl"))]
    return [ln for ln in lines if "val_loss" in ln]


def test_val_loss_mean_independent_of_scorer_failures(tmp_path, monkeypatch):
    from gtcrn_micro_tpu.train import train as train_mod
    from gtcrn_micro_tpu.utils.make_smoke_data import make_smoke_data

    root, cfg_ok = _make_cfg(tmp_path, "exp_ok")
    make_smoke_data(root, n_train=8, n_val=2, seconds=1.0)

    # run 1: scorer succeeds (deterministic finite score)
    monkeypatch.setattr(train_mod, "quality_score", lambda c, e, fs: 1.0)
    exp_ok = train_mod.run(cfg_ok)
    ok = _read_val_metrics(exp_ok)
    assert ok, "no val metrics logged"

    # run 2: same data/seed, every score fails -> val_loss must be IDENTICAL
    _, cfg_bad = _make_cfg(tmp_path, "exp_bad")
    monkeypatch.setattr(train_mod, "quality_score",
                        lambda c, e, fs: float("nan"))
    exp_bad = train_mod.run(cfg_bad)
    bad = _read_val_metrics(exp_bad)

    assert len(ok) == len(bad) == 1
    np.testing.assert_allclose(bad[0]["val_loss"], ok[0]["val_loss"],
                               rtol=1e-6)
    assert bad[0]["val_score"] == 0.0  # nan-aware aggregate, not nan
    # both runs saw 2 validation batches; with the old bug run 2's val_loss
    # would have been 2x run 1's
    assert np.isfinite(bad[0]["val_loss"])
