"""Headless interactive session controller — the demo's state machine.

Re-derivation of `interactive_demo/controller.py:10-154` without Tk:
  * `add_click(x, y, is_positive)` runs one user-click round (snapshotting
    state for undo, controller.py:48-52);
  * `undo_click` restores the previous snapshot (controller.py:61-68);
  * `finish_object` freezes the current object into the uint16 multi-object
    result mask with a fresh object id (controller.py:74-87);
  * `set_mask` injects an external init mask (controller.py:89-100);
  * `result_mask` / `current_object_prob` accessors (controller.py:102-120);
  * `get_visualization` renders the blended panel (controller.py:122-154).

The device work per click is one dispatch (predictor.user_click_step).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from .predictor import PredictorConfig, SessionState


class Click:
    def __init__(self, is_positive: bool, coords):
        self.is_positive = is_positive
        self.coords = tuple(coords)          # (y, x)


class InteractiveController:
    """Session state machine over ANY predictor exposing the uniform
    surface (set_input / user_click / undo_click / probs / state) — the
    fused NoBRS Predictor by default, or any BRS predictor from
    `brs.get_predictor` (the reference app's BRS-mode selector,
    app.py:95-130)."""

    def __init__(self, params, cfg: PredictorConfig,
                 prob_thresh: float = 0.5, predictor=None,
                 brs_mode: str = "NoBRS", int8: bool = False):
        self.params = params
        self.cfg = cfg
        self.prob_thresh = prob_thresh
        self.brs_mode = brs_mode
        self.int8 = int8
        self.predictor = predictor or self._build_predictor(brs_mode)
        self.image: Optional[np.ndarray] = None
        self._init_mask: Optional[np.ndarray] = None
        self._result_mask: Optional[np.ndarray] = None
        self._undo: List = []
        self.clicks_list: List[Click] = []
        self.object_count = 0
        self.probs_history: List[np.ndarray] = []

    def _build_predictor(self, brs_mode: str):
        from .brs import get_predictor
        return get_predictor(self.params, self.cfg, brs_mode=brs_mode,
                             int8=self.int8 and brs_mode.lower() == "nobrs")

    # ---------------------------------------------------------------- session

    def set_image(self, image: np.ndarray) -> None:
        self.image = image
        self._result_mask = np.zeros(image.shape[:2], np.uint16)
        self.object_count = 0
        self.reset_last_object()

    def set_brs_mode(self, brs_mode: str) -> None:
        """Swap the predictor (reference app's BRS selector). Resets the
        in-progress object's clicks; finished objects stay."""
        if brs_mode == self.brs_mode:
            return
        self.brs_mode = brs_mode
        self.predictor = self._build_predictor(brs_mode)
        if self.image is not None:
            self.reset_last_object()

    def set_net_clicks_limit(self, limit: Optional[int]) -> None:
        """GUI 'network clicks' entry (reference app.py state
        net_clicks_limit, INF = no limit): rebuild the predictor with the
        new truncation; the in-progress object resets (its cached
        predictions used the old limit), finished objects stay."""
        if limit == self.cfg.net_clicks_limit:
            return
        import dataclasses
        self.cfg = dataclasses.replace(self.cfg, net_clicks_limit=limit)
        self.predictor = self._build_predictor(self.brs_mode)
        if self.image is not None:
            self.reset_last_object()

    def reset_last_object(self) -> None:
        assert self.image is not None
        h, w = self.image.shape[:2]
        gt = np.zeros((h, w), np.float32)        # demo has no gt
        self.predictor.set_input(self.image, gt)
        if self._init_mask is not None:
            st = self.predictor.state
            hc, wc = st.gt.shape
            probs = np.zeros((1, hc, wc, 1), np.float32)
            probs[0, :h, :w, 0] = self._init_mask
            self.predictor.state = st._replace(prev_probs=jnp.asarray(probs))
        self._undo = []
        self.clicks_list = []
        self.probs_history = []

    def set_mask(self, mask: np.ndarray) -> None:
        """External init mask (controller.py:89-100)."""
        assert self.image is not None and \
            mask.shape == self.image.shape[:2]
        self._init_mask = mask.astype(np.float32)
        self.reset_last_object()

    # ----------------------------------------------------------------- clicks

    def add_click(self, x: float, y: float, is_positive: bool) -> None:
        self._undo.append((list(self.clicks_list),
                           list(self.probs_history)))
        self.predictor.user_click(y, x, is_positive)
        self.clicks_list.append(Click(is_positive, (y, x)))
        self.probs_history.append(self.current_object_prob.copy())

    def undo_click(self) -> None:
        if self._undo:
            self.predictor.undo_click()
            self.clicks_list, self.probs_history = self._undo.pop()

    # ---------------------------------------------------------------- results

    @property
    def state(self) -> SessionState:
        return self.predictor.state

    @property
    def current_object_prob(self) -> np.ndarray:
        h, w = self.image.shape[:2]
        return np.asarray(self.predictor.state.prev_probs[0, :h, :w, 0])

    @property
    def is_incomplete_mask(self) -> bool:
        return len(self.clicks_list) > 0

    def finish_object(self) -> None:
        """controller.py:74-87: freeze current object into the result mask."""
        if not self.probs_history:
            return
        mask = self.current_object_prob > self.prob_thresh
        self.object_count += 1
        self._result_mask[mask] = self.object_count
        self._init_mask = None
        self.reset_last_object()

    @property
    def result_mask(self) -> np.ndarray:
        mask = self._result_mask.copy()
        if self.probs_history:
            mask[self.current_object_prob > self.prob_thresh] = \
                self.object_count + 1
        return mask

    def get_visualization(self, alpha_blend: float = 0.6,
                          click_radius: int = 4) -> Optional[np.ndarray]:
        if self.image is None:
            return None
        from ..utils.vis import draw_with_blend_and_clicks
        return draw_with_blend_and_clicks(
            self.image, mask=self.result_mask, alpha=alpha_blend,
            clicks_list=self.clicks_list, radius=click_radius)
