#!/bin/bash
# Reference eval protocol parity (scripts/eval_tum.sh): TUM fr1 sequences,
# headless, single-threaded, subsample 2, ATE via built-in Sim3-aligned RMSE.
set -e
DATAROOT=${DATAROOT:-datasets/tum}
CONFIG=${CONFIG:-config/eval_calib.yaml}
SEQS="rgbd_dataset_freiburg1_360 rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg1_desk2 rgbd_dataset_freiburg1_floor rgbd_dataset_freiburg1_plant rgbd_dataset_freiburg1_room rgbd_dataset_freiburg1_rpy rgbd_dataset_freiburg1_teddy rgbd_dataset_freiburg1_xyz"
for seq in $SEQS; do
  python main.py --dataset "$DATAROOT/$seq" --config "$CONFIG" --no-viz \
    --save-as tum --gt "$DATAROOT/$seq/groundtruth.txt"
done
