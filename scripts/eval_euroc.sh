#!/bin/bash
set -e
DATAROOT=${DATAROOT:-datasets/euroc}
CONFIG=${CONFIG:-config/eval_no_calib.yaml}
SEQS="MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult"
for seq in $SEQS; do
  python main.py --dataset "$DATAROOT/$seq" --config "$CONFIG" --no-viz \
    --save-as euroc --gt "groundtruths/euroc/$seq.txt"
done
