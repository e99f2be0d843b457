#!/bin/bash
# DNS3 blind test set puller (reference scripts/pull_dns3_data.sh analog).
# NOTE: this build environment has no egress; run where the network exists.
set -euo pipefail
DEST="${1:-data/DNS3}"
mkdir -p "$DEST"
URL="https://dns-challenge.azurewebsites.net/DNS3/blind_testset_v3_challenge_withSNR_16k.zip"
echo "fetching $URL -> $DEST"
curl -L "$URL" -o "$DEST/dns3_blind.zip"
unzip -q "$DEST/dns3_blind.zip" -d "$DEST"
