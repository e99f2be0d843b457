#!/bin/bash
# Training driver (reference scripts/train.sh analog).
# Single-controller JAX drives all local devices; multi-host adds
# --distributed (jax.distributed.initialize) -- no mp.spawn / rank plumbing.
#
# SLURM usage:  sbatch scripts/train.sh [config]
#SBATCH --job-name=gtcrn_micro_tpu
#SBATCH --output=train_%j.log
#SBATCH --time=48:00:00
set -euo pipefail
CONFIG="${1:-configs/cfg_train_dns3.yaml}"
python -m gtcrn_micro_tpu.train.train -C "$CONFIG"
