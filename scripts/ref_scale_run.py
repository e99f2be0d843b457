"""Reference-scale training traversal with a mid-run SIGKILL + resume.

Executes the single largest previously-untested surface of the rebuild
(r4 verdict #1): the real recipe SHAPE — batch 8 x 10 s crops, warmup 25k /
cosine-decay-to-250k schedule (reference conf/cfg_train_DNS3.yaml,
utils/scheduler.py:39-51), per-epoch checkpoints, best tracking — run far
enough to cross the warmup knee into the cosine region (22 epochs x 1250
steps = 27,500 steps), with a SIGKILL mid-epoch-11 and an orbax resume that
finishes the same recipe (reference resume: train.py:223-237).

Corpus: the in-env synthetic tone-mixture recipe (make_smoke_data), 10,000
train clips x 10 s — the reference epoch shape (num_data_per_epoch=10000,
batch 8 -> 1250 steps/epoch).

Produces <root>/summary.json with the three verdicts the evidence needs:
  - lr_traverse: metrics.jsonl lr ramps linearly to max_lr at step 25,000
    then decreases (cosine) — the warmup knee was crossed in-graph
  - seam_continuity: train_loss just after the resume seam vs just before
  - retention: checkpoint steps on disk (max_to_keep window + best)

Run:  python scripts/ref_scale_run.py [--kill-at-step 13000] [--root ...]
(backgrounded; ~45-70 min on one v5e chip at bf16, incl. the documented
post-kill device-grant reattach delay of up to ~15 min.)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS_PER_EPOCH = 1250  # 10,000 clips / batch 8
TOTAL_EPOCHS = 22       # 27,500 steps: knee at 25k + 2.5k cosine steps


def base_config(root: str) -> dict:
    return {
        "network": "gtcrn_micro",
        "network_config": {"n_fft": 512, "hop_len": 256, "win_len": 512},
        "seed": 43,
        "scheduler": {"kwargs": {
            # the reference DNS3 schedule, verbatim
            "warmup_steps": 25000, "decay_until_step": 250000,
            "max_lr": 1e-3, "min_lr": 1e-6,
        }},
        "loss": {"compress_factor": 0.3, "lamda_ri": 30, "lamda_mag": 70},
        "train_dataset": {
            "noisy_root": os.path.join(root, "data/train/noisy"),
            "fs": 16000, "length_seconds": 10,
            "num_data_per_epoch": 10000, "random_start": False,
            "train": True,
        },
        "train_dataloader": {"batch_size": 8, "num_workers": 2,
                             "drop_last": True},
        "valid_dataset": {
            "noisy_root": os.path.join(root, "data/val/noisy"),
            "fs": 16000, "length_seconds": 10, "train": False,
        },
        "valid_dataloader": {"batch_size": 4, "num_workers": 2},
        "samplerate": 16000,
        "trainer": {
            "epochs": TOTAL_EPOCHS, "save_checkpoint_interval": 1,
            "clip_grad_norm": 3.0,
            "exp_path": os.path.join(root, "exp/ref_scale"),
            "resume": False, "precision": "bf16", "log_every": 50,
        },
    }


def ensure_corpus(root: str) -> None:
    marker = os.path.join(root, "data", ".complete")
    if os.path.exists(marker):
        print("corpus already present", flush=True)
        return
    from gtcrn_micro_tpu.utils.make_smoke_data import make_smoke_data

    t0 = time.time()
    make_smoke_data(os.path.join(root, "data"), n_train=10000, n_val=8,
                    seconds=10.0, seed=43)
    open(marker, "w").close()
    print(f"corpus generated in {time.time() - t0:.0f}s", flush=True)


def exp_dir(root: str) -> str | None:
    runs = sorted(glob.glob(os.path.join(root, "exp/ref_scale_*")))
    return runs[-1] if runs else None


def last_logged_step(root: str) -> int:
    d = exp_dir(root)
    if d is None:
        return 0
    path = os.path.join(d, "logs/metrics.jsonl")
    if not os.path.exists(path):
        return 0
    step = 0
    with open(path) as f:
        for line in f:
            try:
                step = max(step, json.loads(line).get("step", 0))
            except json.JSONDecodeError:
                pass
    return step


def launch(cfg_path: str, log_path: str) -> subprocess.Popen:
    logf = open(log_path, "w")
    return subprocess.Popen(
        [sys.executable, "-m", "gtcrn_micro_tpu.train.train", "-C", cfg_path],
        stdout=logf, stderr=subprocess.STDOUT, cwd=REPO,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/gtcrn_ref_scale")
    ap.add_argument("--kill-at-step", type=int, default=13000,
                    help="SIGKILL run 1 at this step (mid-epoch-11; the "
                         "epoch-10 checkpoint at 12500 is the resume point)")
    args = ap.parse_args()
    root = args.root
    os.makedirs(root, exist_ok=True)

    import yaml

    ensure_corpus(root)
    cfg1 = base_config(root)
    cfg2 = base_config(root)
    cfg2["trainer"]["resume"] = True
    p1 = os.path.join(root, "run1.yaml")
    p2 = os.path.join(root, "run2.yaml")
    with open(p1, "w") as f:
        yaml.safe_dump(cfg1, f)
    with open(p2, "w") as f:
        yaml.safe_dump(cfg2, f)

    # ---- phase 1: fresh run, SIGKILL mid-epoch-11 ----
    print("phase 1: launch fresh run", flush=True)
    t0 = time.time()
    proc = launch(p1, os.path.join(root, "run1.log"))
    killed_at = None
    while True:
        time.sleep(20)
        if proc.poll() is not None:
            print(f"run 1 exited rc={proc.returncode} before the kill point",
                  flush=True)
            return 1
        step = last_logged_step(root)
        print(f"  t={time.time() - t0:7.0f}s step={step}", flush=True)
        if step >= args.kill_at_step:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            killed_at = step
            print(f"SIGKILLed run 1 at logged step {step}", flush=True)
            break

    # ---- phase 2: resume, run to completion ----
    # the next TPU attach after a killed process can stall up to ~15 min
    # (documented tunnel behavior); just wait it out
    time.sleep(30)
    print("phase 2: resume", flush=True)
    t1 = time.time()
    proc = launch(p2, os.path.join(root, "run2.log"))
    while proc.poll() is None:
        time.sleep(60)
        print(f"  t={time.time() - t1:7.0f}s step={last_logged_step(root)}",
              flush=True)
    print(f"run 2 exited rc={proc.returncode}", flush=True)
    if proc.returncode != 0:
        return 2

    # ---- phase 3: verify ----
    d = exp_dir(root)
    recs = []
    with open(os.path.join(d, "logs/metrics.jsonl")) as f:
        for line in f:
            recs.append(json.loads(line))
    lr = [(r["step"], r["lr"]) for r in recs if "lr" in r]
    tl = [(r["step"], r["train_loss"]) for r in recs if "train_loss" in r]
    # seam: resume restored the epoch-10 checkpoint (step 12500)
    seam = 12500
    before = [v for s, v in tl if seam - 500 <= s <= seam]
    after = [v for s, v in tl if seam < s <= seam + 500 and s > killed_at]
    # after-the-seam points are re-runs of epoch 11 by run 2; compare level
    lr_at = dict(lr)
    peak_step = max(lr, key=lambda sv: sv[1])[0]
    ckpt_steps = sorted(
        int(os.path.basename(p)) for p in
        glob.glob(os.path.join(d, "checkpoints", "[0-9]*"))
        if os.path.basename(p).isdigit()
    )
    with open(os.path.join(d, "checkpoints/best_score.json")) as f:
        best = json.load(f)
    summary = {
        "exp_dir": d,
        "killed_at_logged_step": killed_at,
        "final_step": max(s for s, _ in tl),
        "lr_peak_step": peak_step,
        "lr_at_24950": lr_at.get(24950),
        "lr_at_25000": lr_at.get(25000),
        "lr_at_27500": lr_at.get(27500),
        "loss_before_seam_mean": sum(before) / max(len(before), 1),
        "loss_after_seam_mean": sum(after) / max(len(after), 1),
        "checkpoint_steps_on_disk": ckpt_steps,
        "best": best,
        "run1_wall_s": None,
        "total_wall_s": time.time() - t0,
    }
    out = os.path.join(root, "summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)
    print(f"summary -> {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
