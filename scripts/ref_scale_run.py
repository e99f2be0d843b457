"""Reference-scale training traversal with mid-run SIGKILL + resume seams.

Executes the single largest previously-untested surface of the rebuild
(r4 verdict #1): the real recipe SHAPE — batch 8 x 10 s crops, warmup 25k /
cosine-decay-to-250k schedule (reference conf/cfg_train_DNS3.yaml,
utils/scheduler.py:39-51), per-epoch checkpoints, best tracking — run far
enough to cross the warmup knee into the cosine region (22 epochs x 1250
steps = 27,500 steps), with a SIGKILL mid-epoch and an orbax resume that
finishes the same recipe (reference resume: train.py:223-237).

Corpus: the in-env synthetic tone-mixture recipe (make_smoke_data), 10,000
train clips x 10 s — the reference epoch shape (num_data_per_epoch=10000,
batch 8 -> 1250 steps/epoch).

RSS watchdog (r5): the axon tunnel client journals every host->device
payload for session park/restore, so trainer host RSS grows with every
batch transferred (scripts/leak_probe{,2}.py convicted the transfer layer
itself: ~1.27x payload bytes, unconditionally).  The r5 first attempt
died at step ~12,050 when the 128 GB host OOM-killed it.  Two-part
response: the data path ships int16 PCM (halves bytes; bit-exact,
tests/train/test_int16_transfer.py), and this driver SIGKILLs + resumes
the trainer whenever its RSS crosses --rss-limit-gb — every restart is
one more observed kill/resume seam, i.e. the failure mode feeds the
evidence this run exists to produce.

Produces <root>/summary.json with the verdicts the evidence needs:
  - lr_traverse: metrics.jsonl lr ramps linearly to max_lr at step 25,000
    then decreases (cosine) — the warmup knee was crossed in-graph
  - seams: per restart, the checkpoint step resumed from and train_loss
    just before vs just after (continuity across every kill)
  - retention: checkpoint steps on disk (max_to_keep window + best)

Run:  python scripts/ref_scale_run.py [--kill-at-step 13000] [--root ...]
      [--resume-only]
(backgrounded; a few hours on one v5e chip at bf16 incl. the documented
post-kill device-grant reattach delay of up to ~15 min per restart.)
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
            # ship raw PCM, dequantize in-graph (bit-exact; halves the
            # axon journal growth -- module docstring)
            "transfer_dtype": "int16",
        },
        "train_dataloader": {"batch_size": 8, "num_workers": 2,
                             "drop_last": True},
        "valid_dataset": {
            "noisy_root": os.path.join(root, "data/val/noisy"),
            "fs": 16000, "length_seconds": 10, "train": False,
            "transfer_dtype": "int16",
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


def rss_gb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1048576.0
    except OSError:
        pass
    return 0.0


def latest_ckpt_step(root: str) -> int:
    d = exp_dir(root)
    if d is None:
        return 0
    steps = [
        int(os.path.basename(p)) for p in
        glob.glob(os.path.join(d, "checkpoints", "[0-9]*"))
        if os.path.basename(p).isdigit()
    ]
    return max(steps, default=0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/gtcrn_ref_scale")
    ap.add_argument("--kill-at-step", type=int, default=13000,
                    help="SIGKILL run 1 at this step (mid-epoch-11; the "
                         "epoch-10 checkpoint at 12500 is the resume point)")
    ap.add_argument("--resume-only", action="store_true",
                    help="skip the fresh launch: resume the existing run "
                         "under --root (e.g. after an externally-killed "
                         "run 1 -- the r5 host-OOM kill at step ~12,050 is "
                         "itself a valid mid-epoch SIGKILL seam)")
    ap.add_argument("--rss-limit-gb", type=float, default=55.0,
                    help="SIGKILL + resume the trainer when its RSS "
                         "crosses this (axon journal growth; docstring)")
    ap.add_argument("--max-restarts", type=int, default=12)
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

    # ---- watchdog loop: run to completion through kill/resume seams ----
    t0 = time.time()
    proc = None
    run_no = 0
    intentional_done = args.resume_only
    killed_at = last_logged_step(root) if args.resume_only else None
    seams: list[dict] = []
    if args.resume_only:
        print(f"--resume-only: existing run last logged step {killed_at}",
              flush=True)

    while True:
        if proc is None:
            run_no += 1
            if run_no > args.max_restarts:
                print(f"giving up after {args.max_restarts} restarts",
                      flush=True)
                return 3
            fresh = run_no == 1 and not args.resume_only
            if not fresh:
                seam = latest_ckpt_step(root)
                seams.append({"resumed_from_ckpt_step": seam,
                              "killed_at_logged_step":
                                  last_logged_step(root)})
                print(f"relaunch {run_no}: resuming from checkpoint step "
                      f"{seam} (next attach may stall ~15 min)", flush=True)
                time.sleep(10)
            else:
                print("launch fresh run", flush=True)
            # timestamped log names so a --resume-only pass never clobbers
            # the earlier attempt's evidence
            proc = launch(p1 if fresh else p2,
                          os.path.join(root,
                                       f"run{run_no}_{int(t0)}.log"))
        time.sleep(20)
        rc = proc.poll()
        if rc is not None:
            step = last_logged_step(root)
            if rc == 0:
                print(f"trainer completed (rc=0) at step {step}", flush=True)
                break
            print(f"trainer exited rc={rc} at step {step}; relaunching",
                  flush=True)
            proc = None
            continue
        step = last_logged_step(root)
        rss = rss_gb(proc.pid)
        print(f"  t={time.time() - t0:7.0f}s run={run_no} step={step} "
              f"rss={rss:5.1f} GB", flush=True)
        if not intentional_done and step >= args.kill_at_step:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            proc = None
            intentional_done = True
            killed_at = step
            print(f"SIGKILL (intentional seam) at logged step {step}",
                  flush=True)
        elif rss > args.rss_limit_gb:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            proc = None
            print(f"SIGKILL (rss watchdog: {rss:.1f} GB > "
                  f"{args.rss_limit_gb} GB) at logged step {step}",
                  flush=True)

    # ---- verify ----
    d = exp_dir(root)
    recs = []
    with open(os.path.join(d, "logs/metrics.jsonl")) as f:
        for line in f:
            recs.append(json.loads(line))
    lr = [(r["step"], r["lr"]) for r in recs if "lr" in r]
    tl = [(r["step"], r["train_loss"]) for r in recs if "train_loss" in r]
    # continuity at every restart: metrics.jsonl is append-only, so a
    # restart shows as a step that does not increase between consecutive
    # train_loss records (the resumed run re-logs the killed epoch's steps)
    seam_stats = []
    for i in range(1, len(tl)):
        if tl[i][0] <= tl[i - 1][0]:
            before = [v for _, v in tl[max(0, i - 10):i]]
            after = [v for _, v in tl[i:i + 10]]
            seam_stats.append({
                "resumed_at_step": tl[i][0],
                "loss_before_mean": sum(before) / len(before),
                "loss_after_mean": sum(after) / len(after),
            })
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
        "driver_seams": seams,
        "seam_continuity": seam_stats,
        "final_step": max(s for s, _ in tl),
        "lr_peak_step": peak_step,
        "lr_at_24950": lr_at.get(24950),
        "lr_at_25000": lr_at.get(25000),
        "lr_at_27500": lr_at.get(27500),
        "checkpoint_steps_on_disk": ckpt_steps,
        "best": best,
        "restarts": run_no - 1,
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
