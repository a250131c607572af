#!/usr/bin/env bash
# IGG-fruit lab example (RealSense captures + laser-scanned ground truth).
# Mirrors /root/reference/scripts/download_lab_data_example.sh.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p data
cd data
wget -c https://www.ipb.uni-bonn.de/html/projects/shape_completion/igg_fruit_example.zip
unzip -o igg_fruit_example.zip
rm igg_fruit_example.zip
echo "lab example data ready under data/igg_fruit_example"
