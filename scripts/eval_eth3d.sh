#!/bin/bash
set -e
DATAROOT=${DATAROOT:-datasets/eth3d}
CONFIG=${CONFIG:-config/eth3d.yaml}
SEQS=${SEQS:-$(ls "$DATAROOT")}
for seq in $SEQS; do
  python main.py --dataset "$DATAROOT/$seq" --config "$CONFIG" --no-viz \
    --save-as eth3d --gt "$DATAROOT/$seq/groundtruth.txt"
done
