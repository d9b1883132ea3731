#!/bin/bash
# Convenience launcher mirroring the reference's run_train.sh. --ngpus/
# --is-model-path have no meaning here (the device mesh spans every local
# chip automatically; the model script itself is snapshotted into the
# experiment dir for provenance, utils/exp.py).

python train.py models/iSegNet/vpu_base448_cocolvis.py \
    --batch-size=12 \
    --workers=4
