"""Training augmentations — numpy re-implementations of the albumentations
pipeline used by the shipped config (`models/iSegNet/vpu_base448_cocolvis.py:
82-94`): UniformRandomResize, HorizontalFlip, PadIfNeeded(border 0),
RandomCrop, RandomBrightnessContrast, RGBShift.

(The reference's `isegm.data.transforms` module was never published; the
augmentation list itself is in the config. albumentations isn't in the image,
so these follow the albumentations formulas directly.)

Every transform maps (image uint8 (H,W,3), masks (K,H,W) int32) -> same,
geometric ops applied to both (nearest for masks), photometric to the image.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:                      # pragma: no cover
    cv2 = None


def _resize_image(img: np.ndarray, h: int, w: int) -> np.ndarray:
    if cv2 is not None:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    from PIL import Image
    return np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))


def _resize_mask(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    if cv2 is not None:
        # avoid the astype copy for dtypes cv2 resizes natively (the hot
        # path: int32 masks from the datasets; ~1 MB memcpy per mask saved)
        if mask.dtype not in (np.uint8, np.int32, np.float32):
            mask = mask.astype(np.int32)
        return cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
    from PIL import Image
    return np.asarray(Image.fromarray(mask.astype(np.int32), mode="I")
                      .resize((w, h), Image.NEAREST))


class Transform:
    def __call__(self, rng: np.random.Generator, image: np.ndarray,
                 masks: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError


class Compose(Transform):
    def __init__(self, transforms: Sequence[Transform], p: float = 1.0):
        self.transforms = list(transforms)
        self.p = p

    def __call__(self, rng, image, masks):
        if rng.uniform() > self.p:
            return image, masks
        for t in self.transforms:
            image, masks = t(rng, image, masks)
        return image, masks


class UniformRandomResize(Transform):
    """Scale sampled uniformly from scale_range (RITM-lineage transform)."""

    def __init__(self, scale_range=(0.9, 1.1), p: float = 1.0):
        self.scale_range = scale_range
        self.p = p

    def __call__(self, rng, image, masks):
        if rng.uniform() > self.p:
            return image, masks
        scale = rng.uniform(*self.scale_range)
        h = max(1, int(round(image.shape[0] * scale)))
        w = max(1, int(round(image.shape[1] * scale)))
        image = _resize_image(image, h, w)
        masks = np.stack([_resize_mask(m, h, w) for m in masks])
        return image, masks


class HorizontalFlip(Transform):
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, rng, image, masks):
        if rng.uniform() > self.p:
            return image, masks
        return image[:, ::-1].copy(), masks[:, :, ::-1].copy()


class PadIfNeeded(Transform):
    """Centered zero padding to at least (min_height, min_width)
    (albumentations border_mode=0/value 0)."""

    def __init__(self, min_height: int, min_width: int, p: float = 1.0):
        self.mh = min_height
        self.mw = min_width

    def __call__(self, rng, image, masks):
        h, w = image.shape[:2]
        ph = max(0, self.mh - h)
        pw = max(0, self.mw - w)
        if ph == 0 and pw == 0:
            return image, masks
        top, left = ph // 2, pw // 2
        bot, right = ph - top, pw - left
        image = np.pad(image, ((top, bot), (left, right), (0, 0)))
        masks = np.pad(masks, ((0, 0), (top, bot), (left, right)))
        return image, masks


class RandomCrop(Transform):
    def __init__(self, height: int, width: int):
        self.h = height
        self.w = width

    def __call__(self, rng, image, masks):
        h, w = image.shape[:2]
        assert h >= self.h and w >= self.w, (h, w, self.h, self.w)
        y = int(rng.integers(0, h - self.h + 1))
        x = int(rng.integers(0, w - self.w + 1))
        return (image[y:y + self.h, x:x + self.w],
                masks[:, y:y + self.h, x:x + self.w])


class RandomBrightnessContrast(Transform):
    """albumentations formula (brightness_by_max=True):
    out = clip(img * (1 + contrast) + brightness * 255)."""

    def __init__(self, brightness_limit=(-0.25, 0.25),
                 contrast_limit=(-0.15, 0.4), p: float = 0.75):
        self.bl = brightness_limit
        self.cl = contrast_limit
        self.p = p

    def __call__(self, rng, image, masks):
        if rng.uniform() > self.p:
            return image, masks
        alpha = 1.0 + rng.uniform(*self.cl)
        beta = rng.uniform(*self.bl)
        out = image.astype(np.float32) * alpha + beta * 255.0
        return np.clip(out, 0, 255).astype(np.uint8), masks


class RGBShift(Transform):
    def __init__(self, r_shift_limit=10, g_shift_limit=10, b_shift_limit=10,
                 p: float = 0.75):
        self.limits = (r_shift_limit, g_shift_limit, b_shift_limit)
        self.p = p

    def __call__(self, rng, image, masks):
        if rng.uniform() > self.p:
            return image, masks
        shifts = np.array([rng.integers(-l, l + 1) for l in self.limits],
                          np.float32)
        out = image.astype(np.float32) + shifts[None, None, :]
        return np.clip(out, 0, 255).astype(np.uint8), masks


def train_augmentator(crop_size: Tuple[int, int]) -> Compose:
    """The shipped training pipeline (vpu_base448_cocolvis.py:82-90)."""
    return Compose([
        UniformRandomResize(scale_range=(0.75, 1.40)),
        HorizontalFlip(),
        PadIfNeeded(min_height=crop_size[0], min_width=crop_size[1]),
        RandomCrop(*crop_size),
        RandomBrightnessContrast(brightness_limit=(-0.25, 0.25),
                                 contrast_limit=(-0.15, 0.4), p=0.75),
        RGBShift(r_shift_limit=10, g_shift_limit=10, b_shift_limit=10, p=0.75),
    ])


def val_augmentator(crop_size: Tuple[int, int]) -> Compose:
    """vpu_base448_cocolvis.py:92-95."""
    return Compose([
        PadIfNeeded(min_height=crop_size[0], min_width=crop_size[1]),
        RandomCrop(*crop_size),
    ])
