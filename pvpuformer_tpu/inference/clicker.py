"""Host-side Clicker — reference-compatible oracle click generator.

API-compatible re-derivation of `isegm/inference/clicker.py:6-118` for users
migrating from the reference (the fused predictor does this on device —
ops/edt.py — so this class exists for compatibility and for testing the
on-device path against an independent host implementation):

  * next click = argmax of the exact L2 EDT over the larger of FN/FP error
    regions, already-clicked pixels excluded, first-max row-major tie-break
    (clicker.py:29-56);
  * the masks are padded by 1 pixel before the transform so image borders
    count as background (clicker.py:33-42);
  * click list with indices, get/set_state for undo (clicker.py:58-118).

Uses scipy's exact EDT instead of cv2 (identical values for DIST_L2
maskSize=0 — both are exact transforms).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class Click:
    def __init__(self, is_positive: bool, coords: Tuple[int, int],
                 indx: Optional[int] = None):
        self.is_positive = is_positive
        self.coords = coords
        self.indx = indx

    @property
    def coords_and_indx(self):
        return (*self.coords, self.indx)

    def copy(self, **kwargs):
        self_copy = dict(is_positive=self.is_positive, coords=self.coords,
                         indx=self.indx)
        self_copy.update(kwargs)
        return Click(**self_copy)


def _exact_edt(mask: np.ndarray) -> np.ndarray:
    from scipy import ndimage
    return ndimage.distance_transform_edt(mask)


class Clicker:
    def __init__(self, gt_mask: Optional[np.ndarray] = None,
                 init_clicks: Optional[List[Click]] = None,
                 ignore_label: int = -1, click_indx_offset: int = 0):
        self.click_indx_offset = click_indx_offset
        if gt_mask is not None:
            self.gt_mask = gt_mask == 1
            self.not_ignore_mask = gt_mask != ignore_label
        else:
            self.gt_mask = None
            self.not_ignore_mask = None
        self.reset_clicks()
        if init_clicks is not None:
            for click in init_clicks:
                self.add_click(click)

    def make_next_click(self, pred_mask: np.ndarray) -> None:
        assert self.gt_mask is not None
        self.add_click(self._get_next_click(pred_mask))

    def get_clicks(self, clicks_limit: Optional[int] = None) -> List[Click]:
        return self.clicks_list[:clicks_limit]

    def _get_next_click(self, pred_mask: np.ndarray,
                        padding: bool = True) -> Click:
        fn_mask = np.logical_and(np.logical_and(self.gt_mask, ~pred_mask),
                                 self.not_ignore_mask)
        fp_mask = np.logical_and(np.logical_and(~self.gt_mask, pred_mask),
                                 self.not_ignore_mask)
        if padding:
            fn_mask = np.pad(fn_mask, 1)
            fp_mask = np.pad(fp_mask, 1)

        fn_dt = _exact_edt(fn_mask)
        fp_dt = _exact_edt(fp_mask)
        if padding:
            fn_dt = fn_dt[1:-1, 1:-1]
            fp_dt = fp_dt[1:-1, 1:-1]
        fn_dt = fn_dt * self.not_clicked_map
        fp_dt = fp_dt * self.not_clicked_map

        fn_max = np.max(fn_dt)
        fp_max = np.max(fp_dt)
        is_positive = fn_max > fp_max
        dt = fn_dt if is_positive else fp_dt
        coords = np.unravel_index(np.argmax(dt), dt.shape)   # row-major first
        return Click(is_positive=bool(is_positive),
                     coords=(int(coords[0]), int(coords[1])))

    def add_click(self, click: Click) -> None:
        coords = click.coords
        click.indx = self.click_indx_offset + self.num_pos_clicks + \
            self.num_neg_clicks
        if click.is_positive:
            self.num_pos_clicks += 1
        else:
            self.num_neg_clicks += 1
        self.clicks_list.append(click)
        if self.gt_mask is not None:
            self.not_clicked_map[coords[0], coords[1]] = False

    def _remove_last_click(self) -> None:
        click = self.clicks_list.pop()
        coords = click.coords
        if click.is_positive:
            self.num_pos_clicks -= 1
        else:
            self.num_neg_clicks -= 1
        if self.gt_mask is not None:
            self.not_clicked_map[coords[0], coords[1]] = True

    def reset_clicks(self) -> None:
        if self.gt_mask is not None:
            self.not_clicked_map = np.ones_like(self.gt_mask, dtype=bool)
        self.num_pos_clicks = 0
        self.num_neg_clicks = 0
        self.clicks_list: List[Click] = []

    def get_state(self):
        return [c.copy() for c in self.clicks_list]

    def set_state(self, state) -> None:
        self.reset_clicks()
        for click in state:
            self.add_click(click)

    def __len__(self) -> int:
        return len(self.clicks_list)
