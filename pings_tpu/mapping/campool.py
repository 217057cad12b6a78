"""Keyframe camera pools (host-side orchestration).

Reference: Mapper.update_cam_pool (utils/mapper.py:609-686): a short-term
FIFO of the latest keyframes (``img_pool_size``) and a long-term pool with
range- and capacity-based eviction; training iterations sample the latest
frame / short-term / long-term with configured probabilities
(mapper.py:1082-1112).

Each pooled keyframe owns a *slot* in the device-side exposure and
camera-delta parameter pools (the trainables live in the gs optimizer
pytree); slots are recycled on eviction and their params reset.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from pings_tpu.models.renderer import CamView


@dataclasses.dataclass
class PooledCam:
    cam: CamView
    slot: int
    frame_id: int
    position: np.ndarray  # world camera center, for range eviction
    T_c_l: Optional[np.ndarray] = None  # cam-from-lidar, for pose refresh
                                        # after PGO corrections
    # cached image-pyramid levels (reference CamImage precomputes its
    # pyramid once, cameras.py:86-186; re-downsampling per training
    # iteration costs several un-jitted device dispatches each)
    pyr: dict = dataclasses.field(default_factory=dict)

    def level(self, lv: int) -> CamView:
        if lv <= 0:
            return self.cam
        if lv not in self.pyr:
            from pings_tpu.models.renderer import downsample_cam
            self.pyr[lv] = downsample_cam(self.cam, lv)
        return self.pyr[lv]

    def set_cam(self, cam: CamView):
        """Replace the camera (e.g. PGO pose refresh) and drop the
        cached pyramid."""
        self.cam = cam
        self.pyr.clear()


class CamPool:
    def __init__(self, cfg, rng: Optional[np.random.Generator] = None):
        self.cfg = cfg
        self.short: List[PooledCam] = []
        self.long: List[PooledCam] = []
        self.n_slots = cfg.img_pool_size + cfg.long_term_pool_size + 1
        self._free = list(range(self.n_slots))
        self.rng = rng or np.random.default_rng(cfg.seed)

    def init_param_pools(self):
        """Device arrays for per-keyframe exposure + pose-delta trainables.
        Exposure is a stacked ExposureParams (leading slot axis); cam_delta
        rows are [theta(3), rho(3)]."""
        from pings_tpu.models.renderer import ExposureParams

        n = self.n_slots
        exposure = ExposureParams(
            mat=jnp.tile(jnp.eye(3), (n, 1, 1)),
            off=jnp.zeros((n, 3)),
            a=jnp.zeros((n,)),
            b=jnp.zeros((n,)),
        )
        cam_delta = jnp.zeros((n, 6))
        return exposure, cam_delta

    def add_keyframe(self, cam: CamView, position: np.ndarray,
                     frame_id: int,
                     T_c_l: Optional[np.ndarray] = None) -> Optional[int]:
        """Insert a keyframe; returns the slot whose exposure/delta params
        should be reset (or None)."""
        if not self._free:
            self._evict_long()
        slot = self._free.pop()
        pc = PooledCam(cam, slot, frame_id, np.asarray(position), T_c_l)
        self.short.append(pc)
        reset_slot = slot
        if len(self.short) > self.cfg.img_pool_size:
            old = self.short.pop(0)
            self.long.append(old)
            if len(self.long) > self.cfg.long_term_pool_size:
                self._evict_long()
        return reset_slot

    def _evict_long(self):
        """Drop the long-term keyframe closest to another (keep spread,
        reference range+capacity eviction mapper.py:640-686)."""
        if not self.long:
            if self.short:
                old = self.short.pop(0)
                self._free.append(old.slot)
            return
        if len(self.long) == 1:
            self._free.append(self.long.pop().slot)
            return
        pos = np.stack([c.position for c in self.long])
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        i = int(np.argmin(d.min(axis=1)))
        self._free.append(self.long.pop(i).slot)

    def prune_by_range(self, center: np.ndarray, radius: float):
        keep, drop = [], []
        for c in self.long:
            (keep if np.linalg.norm(c.position - center) < radius
             else drop).append(c)
        self.long = keep
        for c in drop:
            self._free.append(c.slot)

    def sample(self) -> Optional[PooledCam]:
        """Latest / short-term / long-term sampling
        (mapper.py:1082-1112)."""
        if not self.short and not self.long:
            return None
        r = self.rng.random()
        if self.short and (r < self.cfg.sample_latest_prob or not self.long):
            if r < self.cfg.sample_latest_prob:
                return self.short[-1]
            return self.short[self.rng.integers(len(self.short))]
        if self.short and r < (self.cfg.sample_latest_prob
                               + self.cfg.sample_short_term_prob):
            return self.short[self.rng.integers(len(self.short))]
        if self.long:
            return self.long[self.rng.integers(len(self.long))]
        return self.short[self.rng.integers(len(self.short))]

    def all_cams(self) -> List[PooledCam]:
        return list(self.short) + list(self.long)
