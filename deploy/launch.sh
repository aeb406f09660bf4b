#!/bin/bash
# Launch-file analog of the reference's launch/{kitti,cat,utbm,ona}.launch:
# each reference launch starts the node with one YAML profile; here each
# profile maps to a CLI invocation against a data directory.
#
# Usage:
#   deploy/launch.sh kitti /data/kitti/2011_09_26_drive_0034_sync [extra args]
#   deploy/launch.sh utbm  /data/utbm_seq_dir                     [extra args]
#   deploy/launch.sh cat   /data/cat_seq_dir
#   deploy/launch.sh ona   /data/ona_seq_dir
#   deploy/launch.sh <profile>            # no data dir: synthetic self-test
#
# Data layouts: KITTI raw-sync for `kitti`; the extracted-sequence layout of
# fast_limo_tpu/io/generic.py (per-scan .npy/.bin + imu.csv) for the rest —
# see `python -m fast_limo_tpu.cli make-synthetic --help` to generate one.

set -eu
cd "$(dirname "$0")/.."

PROFILE=${1:?usage: deploy/launch.sh <kitti|cat|utbm|ona> [data_dir] [extra...]}
CFG="configs/${PROFILE}_tpu.yaml"
[ -f "$CFG" ] || { echo "unknown profile: $PROFILE ($CFG missing)"; exit 1; }
shift
DATA=""
if [ $# -gt 0 ] && [ "${1#-}" = "$1" ]; then
    DATA=$1; shift   # second positional (non-flag) = data directory
fi

if [ -z "$DATA" ]; then
    echo "# no data dir given — synthetic self-test with $CFG"
    exec python -m fast_limo_tpu.cli --config "$CFG" synthetic --scans 50 "$@"
elif [ "$PROFILE" = kitti ] && [ -d "$DATA/velodyne_points" ]; then
    exec python -m fast_limo_tpu.cli --config "$CFG" kitti --drive "$DATA" "$@"
else
    exec python -m fast_limo_tpu.cli --config "$CFG" sequence --data "$DATA" "$@"
fi
