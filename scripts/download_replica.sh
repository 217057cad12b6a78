#!/bin/bash
# Fetch the Replica RGB-D SLAM sequences (iMAP/NICE-SLAM rendering,
# the standard release used by the reference download_replica.sh).
# ~12 GB total; pass a sequence name (e.g. room0) to fetch one only.
set -e
ROOT=${PINGS_DATA:-data}
mkdir -p "$ROOT" && cd "$ROOT"
URL="https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip"
if [ ! -d Replica ]; then
  echo "downloading Replica (~12 GB) from $URL"
  wget -c "$URL" -O Replica.zip
  unzip -q Replica.zip && rm Replica.zip
fi
echo "Replica ready under $ROOT/Replica (sequences: room0-2, office0-4)"
echo "run:  python -m pings_tpu.cli configs/run_replica.yaml \\"
echo "        --data-path $ROOT/Replica --seq ${1:-room0}"
