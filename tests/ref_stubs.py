"""Minimal faithful stand-ins for third-party packages the reference imports
but this image lacks (mmcv, timm, easydict, torchvision), so tests can import
and RUN the reference's own torch modules from /root/reference for direct
numerical comparison.

Only the code paths the reference actually exercises are implemented with
real math (ConvModule with norm_cfg=None -> conv + ReLU, the only
configuration its heads use — swin_transformer.py:683-696,
transformer_helper/decode_head.py:55-56); everything else is import-surface
only and raises if called.
"""
from __future__ import annotations

import logging
import sys
import types


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _unpublished_init(self, *a, **k):
    raise NotImplementedError(
        "isegm.data was never published by the reference; "
        "use pvpuformer_tpu.inference.datasets instead")


def install() -> None:
    """Idempotently register easydict/timm/mmcv/torchvision stubs."""
    if "mmcv" in sys.modules and getattr(sys.modules["mmcv"], "_pvpu_stub", False):
        return
    import torch
    import torch.nn as nn

    # legacy numpy aliases the reference's era of numpy still had
    import numpy as np
    for alias, builtin in (("int", int), ("float", float), ("bool", bool)):
        if alias not in np.__dict__:
            np.__dict__[alias] = builtin

    # --- yacs (hrformer_helper/hrt/hrt_config.py:11) — CfgNode is used as
    # an attribute-style nested dict with .clone(); real semantics.
    if "yacs" not in sys.modules:
        yacs = _module("yacs")
        yacs_cfg = _module("yacs.config")
        yacs.config = yacs_cfg

        class CfgNode(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

            def clone(self):
                import copy
                return copy.deepcopy(self)

        yacs_cfg.CfgNode = CfgNode

    # --- bezier (engine/trainer.py:7) — real Bernstein evaluation so
    # cal_scribble runs; nodes are (dim, n_points) as in the real package.
    if "bezier" not in sys.modules:
        bz = _module("bezier")

        class Curve:
            def __init__(self, nodes, degree):
                self.nodes = np.asarray(nodes, dtype=np.float64)
                self.degree = degree

            def evaluate_multi(self, s_vals):
                from math import comb
                n = self.degree
                s = np.asarray(s_vals, dtype=np.float64)
                basis = np.stack([comb(n, i) * s ** i * (1 - s) ** (n - i)
                                  for i in range(n + 1)], axis=0)  # (n+1, N)
                return self.nodes @ basis                          # (dim, N)

        bz.Curve = Curve

    # --- skimage.measure.label (trainer.py:1176, connectivity=2 =
    # 8-connected) via scipy.ndimage.label. Label NUMBERING can differ from
    # skimage's raster order; everything the reference derives from it in
    # the click-protocol path (as_prompt_type=0) is discarded, and the
    # box/scribble tests compare against our own oracles, not this stub.
    if "skimage" not in sys.modules:
        sk = _module("skimage")
        skm = _module("skimage.measure")
        sk.measure = skm

        def label(mask, connectivity=2, background=0):
            from scipy import ndimage
            structure = np.ones((3, 3)) if connectivity == 2 else None
            lab, _ = ndimage.label(np.asarray(mask) != background,
                                   structure=structure)
            return lab

        skm.label = label

    # --- isegm.data (reference-internal, never published — SURVEY.md §2;
    # inference/utils.py:6 imports dataset classes from it at module level).
    # Import-surface only: the protocol test never constructs these.
    if "isegm.data" not in sys.modules:
        data_mod = _module("isegm.data")
        ds_mod = _module("isegm.data.datasets")
        data_mod.datasets = ds_mod
        for _name in ("GrabCutDataset", "BerkeleyDataset", "DavisDataset",
                      "SBDEvaluationDataset", "PascalVocDataset",
                      "BraTSDataset", "ssTEMDataset", "OAIZIBDataset",
                      "HARDDataset", "ADE20kDataset"):
            setattr(ds_mod, _name,
                    type(_name, (), {"__init__": _unpublished_init}))

    # --- easydict ---------------------------------------------------------
    if "easydict" not in sys.modules:
        ed = _module("easydict")

        class EasyDict(dict):
            """Attribute-style dict (what the reference uses for configs)."""

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ed.EasyDict = EasyDict

    # --- timm.models.layers -------------------------------------------------
    if "timm" not in sys.modules:
        timm = _module("timm")
        timm_models = _module("timm.models")
        layers = _module("timm.models.layers")
        timm.models = timm_models
        timm_models.layers = layers

        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob or 0.0

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
                return x.div(keep) * mask.floor_()

        def to_2tuple(v):
            return v if isinstance(v, (tuple, list)) else (v, v)

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = nn.init.trunc_normal_

        registry = _module("timm.models.registry")
        registry.register_model = lambda fn: fn
        timm_models.registry = registry
        tvit = _module("timm.models.vision_transformer")
        tvit._cfg = lambda url="", **kw: dict(url=url, **kw)
        timm_models.vision_transformer = tvit

    # --- torchvision: import-only in swin_transformer_helper/checkpoint.py;
    # predictors/base.py:40 actually calls transforms.ToTensor (HWC uint8
    # [0,255] -> CHW float [0,1]) — implemented with real math so the
    # reference's own BasePredictor can run in the protocol parity test.
    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tvt = _module("torchvision.transforms")
        tv.transforms = tvt

        class ToTensor:
            def __call__(self, pic):
                arr = np.asarray(pic)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                t = torch.from_numpy(
                    arr.transpose(2, 0, 1).copy()).contiguous()
                if arr.dtype == np.uint8:
                    return t.to(torch.float32).div(255)
                return t.to(torch.float32)

        tvt.ToTensor = ToTensor

    # --- mmcv ----------------------------------------------------------------
    mmcv = _module("mmcv")
    mmcv._pvpu_stub = True
    mmcv.jit = lambda **kw: (lambda f: f)

    def mkdir_or_exist(p):
        import os
        os.makedirs(p, exist_ok=True)

    mmcv.mkdir_or_exist = mkdir_or_exist

    class Registry:
        def __init__(self, name, parent=None, build_func=None, scope=None):
            self.name = name
            self._modules = {}

        def register_module(self, name=None, force=False, module=None):
            if module is not None:
                self._modules[name or module.__name__] = module
                return module

            def deco(cls):
                self._modules[name or cls.__name__] = cls
                return cls

            return deco

        def get(self, key):
            return self._modules.get(key)

    def build_from_cfg(cfg, registry, default_args=None):
        args = dict(cfg)
        cls = registry.get(args.pop("type"))
        if default_args:
            args.update(default_args)
        return cls(**args)

    def get_logger(name="mmcv", **kw):
        return logging.getLogger(name)

    mutils = _module("mmcv.utils")
    mutils.Registry = Registry
    mutils.build_from_cfg = build_from_cfg
    mutils.get_logger = get_logger
    mutils.mkdir_or_exist = mkdir_or_exist
    mmcv.utils = mutils

    class ConvModule(nn.Module):
        """conv -> (norm) -> act. The reference only instantiates it with
        norm_cfg=None and act_cfg ReLU/None (decode_head.py:55-56)."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias="auto",
                     conv_cfg=None, norm_cfg=None, act_cfg=dict(type="ReLU"),
                     **kw):
            super().__init__()
            assert norm_cfg is None, "stub implements only norm_cfg=None"
            use_bias = bias if isinstance(bias, bool) else (norm_cfg is None)
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride, padding, dilation, groups,
                                  bias=use_bias)
            self.with_activation = bool(act_cfg)
            if self.with_activation:
                assert act_cfg.get("type") == "ReLU", act_cfg
                self.activate = nn.ReLU(inplace=True)

        def forward(self, x):
            x = self.conv(x)
            if self.with_activation:
                x = self.activate(x)
            return x

    def _unused(*a, **k):
        raise NotImplementedError("stubbed mmcv API not on the tested path")

    mcnn = _module("mmcv.cnn")
    mcnn.ConvModule = ConvModule
    mcnn.build_conv_layer = _unused
    mcnn.build_norm_layer = _unused
    mcnn.MODELS = Registry("mmcv-models")
    mmcv.cnn = mcnn

    bricks = _module("mmcv.cnn.bricks")
    bricks_reg = _module("mmcv.cnn.bricks.registry")
    bricks_reg.ATTENTION = Registry("attention")
    bricks.registry = bricks_reg
    mcnn.bricks = bricks

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    def _deco_with_args(**kw):
        def outer(*a, **k):
            if len(a) == 1 and callable(a[0]) and not k:
                return a[0]
            return lambda f: f
        return outer

    mrunner = _module("mmcv.runner")
    mrunner.BaseModule = BaseModule
    mrunner.auto_fp16 = _deco_with_args()
    mrunner.force_fp32 = _deco_with_args()
    mrunner.get_dist_info = lambda: (0, 1)
    mmcv.runner = mrunner
    mbase = _module("mmcv.runner.base_module")
    mbase.BaseModule = BaseModule
    mrunner.base_module = mbase

    mfileio = _module("mmcv.fileio")
    mfileio.FileClient = _unused
    mfileio.load = _unused
    mmcv.fileio = mfileio

    mparallel = _module("mmcv.parallel")
    mparallel.is_module_wrapper = lambda m: False
    mmcv.parallel = mparallel
