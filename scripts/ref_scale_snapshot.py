"""Snapshot reference-scale-run evidence into the repo, partial-aware.

`scripts/ref_scale_run.py` writes its summary only when the trainer exits
rc=0 — but on this environment the traversal is tunnel-transfer-bound
(~400 ms/step observed r5b, i.e. ~3 h for the 27.5k-step recipe) and /tmp
does not survive host restarts (the r5a attempt's on-disk evidence was
lost to exactly that).  This tool freezes whatever evidence EXISTS right
now — metrics.jsonl, driver log, checkpoint retention, seam continuity —
into `docs/evidence/ref_scale/` so a partial traversal is still durable,
committed proof.

Evidence extracted (same verdicts ref_scale_run.py computes, tolerant of
a still-running or killed-mid-flight run):
  - lr curve: (step, lr) every log interval — shows the linear warmup
    traverse (and the knee + cosine turn if step 25k was crossed)
  - seam continuity: every point where metrics.jsonl's step sequence
    does not increase = a resume re-logging the killed epoch, with mean
    train_loss in the 10 records before vs after
  - retention: checkpoint step dirs on disk + best_score.json
  - driver seams: the watchdog's own kill/relaunch log lines

Run: python scripts/ref_scale_snapshot.py [--root /tmp/gtcrn_ref_scale]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/gtcrn_ref_scale")
    ap.add_argument("--driver-log", default="/tmp/ref_scale_driver.log")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "evidence", "ref_scale"))
    args = ap.parse_args()

    runs = sorted(glob.glob(os.path.join(args.root, "exp/ref_scale_*")))
    if not runs:
        print("no run under", args.root)
        return 1
    d = runs[-1]

    recs = []
    with open(os.path.join(d, "logs/metrics.jsonl")) as f:
        for line in f:
            try:
                recs.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    lr = [(r["step"], r["lr"]) for r in recs if "lr" in r]
    tl = [(r["step"], r["train_loss"]) for r in recs if "train_loss" in r]

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

    ckpt_steps = sorted(
        int(os.path.basename(p)) for p in
        glob.glob(os.path.join(d, "checkpoints", "[0-9]*"))
        if os.path.basename(p).isdigit()
    )
    best = None
    best_path = os.path.join(d, "checkpoints/best_score.json")
    if os.path.exists(best_path):
        with open(best_path) as f:
            best = json.load(f)

    driver_lines: list[str] = []
    if os.path.exists(args.driver_log):
        with open(args.driver_log) as f:
            driver_lines = [
                ln.rstrip() for ln in f
                if re.search(r"SIGKILL|relaunch|launch|corpus|completed|"
                             r"exited", ln)
            ]

    lr_at = dict(lr)
    final_step = max((s for s, _ in tl), default=0)
    summary = {
        "snapshot_unix": time.time(),
        "exp_dir": d,
        "final_logged_step": final_step,
        "n_metric_records": len(recs),
        "lr_first": lr[0] if lr else None,
        "lr_last": lr[-1] if lr else None,
        "lr_peak": max(lr, key=lambda sv: sv[1]) if lr else None,
        "lr_at_25000": lr_at.get(25000),
        "warmup_knee_crossed": final_step >= 25000,
        "seam_continuity": seam_stats,
        "checkpoint_steps_on_disk": ckpt_steps,
        "best": best,
        "driver_log_events": driver_lines,
        "train_loss_first": tl[0] if tl else None,
        "train_loss_last": tl[-1] if tl else None,
    }

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    shutil.copy(os.path.join(d, "logs/metrics.jsonl"),
                os.path.join(args.out, "metrics.jsonl"))
    if driver_lines:
        with open(os.path.join(args.out, "driver_events.log"), "w") as f:
            f.write("\n".join(driver_lines) + "\n")
    print(json.dumps(summary, indent=1))
    print("evidence ->", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
