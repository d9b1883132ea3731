from .vit import ViTConfig, init_vit, vit_backbone_forward, VIT_PRESETS
from .two_way import TwoWayConfig, init_two_way, two_way_forward
from .fpn import NeckConfig, init_neck, neck_forward
from .seg_head import HeadConfig, init_head, head_forward
from .vpu import (VPUConfig, init_vpu, vpu_forward, vpu_backbone_embed,
                  vpu_forward_traced_type, vpu_base_config,
                  vpu_large_config, vpu_huge_config)
from .plainvit import PlainVitConfig, init_plainvit, plainvit_forward
from . import registry
