"""Legacy backbone zoo (RITM/SimpleClick lineage models, SURVEY §2.4).

Capability-breadth re-implementations: SegFormer (MixViT), HRNet+OCR,
DeepLabV3+ (ResNet), Swin — each wrapped as an interactive-segmentation
model with the RITM maps-transform coord-feature path. Not on the VPU hot
path; numerics use frozen batch-norm (affine + stored stats) so torch
weights can still drop in for inference.
"""
from . import common  # noqa: F401
