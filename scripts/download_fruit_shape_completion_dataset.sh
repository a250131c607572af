#!/usr/bin/env bash
# ECCV shape-completion challenge dataset (train/val/test fruit captures).
# Mirrors /root/reference/scripts/download_fruit_shape_completion_dataset.sh.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p data
cd data
wget -c https://www.ipb.uni-bonn.de/html/projects/shape_completion/shape_completion_challenge.zip
unzip -o shape_completion_challenge.zip
rm shape_completion_challenge.zip
echo "challenge dataset ready under data/shape_completion_challenge"
