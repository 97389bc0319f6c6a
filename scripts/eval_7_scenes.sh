#!/bin/bash
set -e
DATAROOT=${DATAROOT:-datasets/7-scenes}
CONFIG=${CONFIG:-config/eval_calib.yaml}
SEQS="chess fire heads office pumpkin redkitchen stairs"
for seq in $SEQS; do
  python main.py --dataset "$DATAROOT/$seq" --config "$CONFIG" --no-viz \
    --save-as 7-scenes --gt "groundtruths/7-scenes/$seq.txt"
done
