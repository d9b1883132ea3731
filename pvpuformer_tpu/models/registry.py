"""Model registry: config type -> (init, forward).

Every model family exposes the same functional surface
    init(key, cfg) -> params
    forward(params, cfg, image (B,H,W,3|4), points (B,2N,3), ...) -> dict
so the fused predictor, the trainer and the CLIs dispatch on the config's
type (replacing the reference's `serialization.get_class_from_str` dynamic
class lookup, isegm/utils/serialization.py:44-112 — here the config IS the
model identity and lives inside the checkpoint).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple, Type

_REGISTRY: Dict[Type, Tuple[Callable, Callable]] = {}


def register(cfg_type: Type, init_fn: Callable, forward_fn: Callable) -> None:
    _REGISTRY[cfg_type] = (init_fn, forward_fn)


def init_for(cfg) -> Callable:
    return _REGISTRY[type(cfg)][0]


def forward_for(cfg) -> Callable:
    return _REGISTRY[type(cfg)][1]


def _populate() -> None:
    from .vpu import VPUConfig, init_vpu, vpu_forward
    from .plainvit import PlainVitConfig, init_plainvit, plainvit_forward
    register(VPUConfig, init_vpu, vpu_forward)
    register(PlainVitConfig, init_plainvit, plainvit_forward)
    try:
        from .zoo.segformer import (SegformerISConfig, init_segformer_is,
                                    segformer_is_forward)
        register(SegformerISConfig, init_segformer_is, segformer_is_forward)
    except ImportError:
        pass
    try:
        from .zoo.hrnet import HRNetISConfig, init_hrnet_is, hrnet_is_forward
        register(HRNetISConfig, init_hrnet_is, hrnet_is_forward)
    except ImportError:
        pass
    try:
        from .zoo.deeplab import (DeeplabISConfig, init_deeplab_is,
                                  deeplab_is_forward)
        register(DeeplabISConfig, init_deeplab_is, deeplab_is_forward)
    except ImportError:
        pass
    try:
        from .zoo.swin import SwinISConfig, init_swin_is, swin_is_forward
        register(SwinISConfig, init_swin_is, swin_is_forward)
    except ImportError:
        pass
    try:
        from .zoo.hrformer import (HRFormerISConfig, init_hrformer_is,
                                   hrformer_is_forward)
        register(HRFormerISConfig, init_hrformer_is, hrformer_is_forward)
    except ImportError:
        pass
    try:
        from .zoo.swin_unet import (SwinUNetISConfig, init_swin_unet_is,
                                    swin_unet_is_forward)
        register(SwinUNetISConfig, init_swin_unet_is, swin_unet_is_forward)
    except ImportError:
        pass


_populate()
