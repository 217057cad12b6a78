#!/bin/bash
# Fetch a 100-frame KITTI odometry example (seq 00 head) for a quick
# LiDAR SLAM smoke run — counterpart of the reference
# download_kitti_example.sh. Full KITTI requires registration at
# https://www.cvlibs.net/datasets/kitti/eval_odometry.php.
set -e
ROOT=${PINGS_DATA:-data}
mkdir -p "$ROOT" && cd "$ROOT"
URL="https://www.ipb.uni-bonn.de/html/projects/kiss-icp/kitti_example.zip"
if [ ! -d kitti_example ]; then
  echo "downloading KITTI example (~400 MB) from $URL"
  wget -c "$URL" -O kitti_example.zip
  unzip -q kitti_example.zip && rm kitti_example.zip
fi
echo "KITTI example ready under $ROOT/kitti_example"
echo "run:  python -m pings_tpu.cli configs/run_kitti.yaml \\"
echo "        --data-path $ROOT/kitti_example --loader kitti --seq 00"
