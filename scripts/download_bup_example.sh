#!/usr/bin/env bash
# BUP20 example sequence (posed RGB-D frames + instance ids + submap meshes).
# Mirrors /root/reference/scripts/download_bup_example.sh (same upstream data).
# Offline alternative: generate a synthetic stand-in dataset with
#   python -m hortimapping_tpu.tools.make_demo_data --out data/BUP20_example_data
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p data
cd data
wget -c https://www.ipb.uni-bonn.de/html/projects/shape_completion/BUP20_example_data.zip
unzip -o BUP20_example_data.zip
rm BUP20_example_data.zip
echo "BUP20 example data ready under data/BUP20_example_data"
