#!/bin/bash
# VCTK-DEMAND puller (reference scripts/pull_vctk_data.sh analog, Edinburgh
# DataShare DS_10283_2791).  No egress in this build environment.
set -euo pipefail
DEST="${1:-data/VCTK_DEMAND}"
mkdir -p "$DEST"
URL="https://datashare.ed.ac.uk/download/DS_10283_2791.zip"
echo "fetching $URL -> $DEST"
curl -L "$URL" -o "$DEST/vctk_demand.zip"
unzip -q "$DEST/vctk_demand.zip" -d "$DEST"
