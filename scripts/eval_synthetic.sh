#!/bin/bash
# End-to-end smoke evaluation on a rendered synthetic clip with the tiny
# model (plumbing) — real-weights evaluation uses eval_tum.sh etc.
set -e
CLIP=${1:-/tmp/slam_clip}
python scripts/make_synthetic_clip.py "$CLIP" 30 96 128
python main.py --dataset "$CLIP" --config config/eval_no_calib.yaml \
  --no-viz --tiny-model --cpu --gt "$CLIP/gt.txt" --save-as synthetic
