"""PVPUFormer-TPU: a TPU-native interactive image segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PVPUFormer
("Probabilistic Visual Prompt Unified Transformer", TIP 2024) — interactive
image segmentation from clicks / boxes / scribbles — designed TPU-first:

* the whole interactive click round (error-mask EDT -> next click -> PPuE
  prompt encoding -> ViT+DMA forward -> flip-TTA merge -> zoom-in paste-back
  -> IoU) compiles to a single XLA program with fixed shapes;
* prompt encoders (PPuE) and disk rasterization are vectorized on device
  instead of host numpy loops;
* scale-out is a `jax.sharding.Mesh` + sharded `jit`, not a comm backend.

Layout:
    ops/        on-device kernels (dist maps, exact EDT, PPuE, resize, attention)
    models/     ViT backbone, DMA two-way transformer, FPN neck, seg head, VPU model
    inference/  functional click session, jitted predictor, NoC evaluation, datasets
    engine/     losses, metrics, optimizer (layer-wise decay), iterloss trainer
    data/       training datasets, point sampler, augmentations
    parallel/   mesh/sharding utilities (DP/FSDP), collectives-backed metric reduction
    utils/      self-describing checkpoints, torch weight ingest, logging
"""

__version__ = "0.1.0"
