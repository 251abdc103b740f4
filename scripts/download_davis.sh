#!/usr/bin/env bash
# Fetch DAVIS 2017 (480p) — the flagship video trainer's dataset
# (reference data/Dataloader.py DVDataset reads JPEGImages/480p +
# Annotations/480p). This build environment has no network egress, so run
# this wherever you stage data, then point configs/video.yaml `data.root`
# at <out>/DAVIS.
#
# Usage: scripts/download_davis.sh [out_dir]
set -euo pipefail
OUT="${1:-./data}"
mkdir -p "$OUT"
cd "$OUT"
URL="https://data.vision.ee.ethz.ch/csergi/share/davis/DAVIS-2017-trainval-480p.zip"
echo "downloading $URL"
curl -LO "$URL" || wget "$URL"
unzip -q DAVIS-2017-trainval-480p.zip
echo "DAVIS ready at $OUT/DAVIS (JPEGImages/480p, Annotations/480p)"
