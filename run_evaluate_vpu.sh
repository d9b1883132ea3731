#!/bin/bash
# Convenience launcher mirroring the reference's run_evaluate_vpu.sh
# (which calls the unpublished evaluate_pclmodel.py; scripts/evaluate.py is
# the equivalent CLI here — same flags, --gpus replaced by --platform).

MODEL_PATH=xxx.npz
python scripts/evaluate.py NoBRS \
    --checkpoint=${MODEL_PATH} \
    --datasets=GrabCut,Berkeley,SBD,DAVIS,PascalVOC,COCO_MVal \
    --cf-n=0 \
    --acf \
    --iou-analysis \
    --save-ious \
    --print-ious
