"""Loop-closure detection: distance gating + polar scan-context descriptors.

Reference: utils/loop_detector.py — ``detect_local_loop`` (:404-440)
proposes travel-dist-gated, drift-gated candidates by pose distance;
``NeuralPointMapContextManager`` builds polar scan-context descriptors
(20 rings x 60 sectors, max-z per bin, ptcloud2sc_torch :443-506), with a
ring-key (row-mean) prefilter and a column-shift cosine match that also
yields a yaw estimate (:218-334); *virtual side nodes* add laterally
shifted copies to tolerate translation offsets (:79-152).

Host-side numpy: descriptors are tiny (20x60) and per-frame cost is
negligible next to mapping.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from pings_tpu.utils import pose as hp


def scan_context(points_local: np.ndarray, num_rings: int = 20,
                 num_sectors: int = 60, max_dist: float = 60.0,
                 min_z: float = -3.0) -> np.ndarray:
    """Polar descriptor: max height per (ring, sector) bin
    (loop_detector.py:443-506). points are in the (virtual) sensor frame."""
    x, y, z = points_local[:, 0], points_local[:, 1], points_local[:, 2]
    r = np.sqrt(x * x + y * y)
    theta = np.arctan2(y, x) + np.pi          # [0, 2pi)
    ring = np.minimum((r / max_dist * num_rings).astype(np.int64),
                      num_rings - 1)
    sector = np.minimum((theta / (2 * np.pi) * num_sectors).astype(np.int64),
                        num_sectors - 1)
    ok = (r < max_dist) & (r > 1e-3)
    sc = np.full(num_rings * num_sectors, min_z, np.float32)
    np.maximum.at(sc, ring[ok] * num_sectors + sector[ok], z[ok])
    sc = sc.reshape(num_rings, num_sectors)
    return np.where(sc > min_z, sc, 0.0)


def scan_context_feature(points_local: np.ndarray, feats: np.ndarray,
                         num_rings: int = 20, num_sectors: int = 60,
                         max_dist: float = 60.0) -> np.ndarray:
    """Feature-augmented descriptor: mean neural-point feature per
    (ring, sector) bin, stacked under the height channel (reference
    loop_with_feature contexts, loop_detector.py:461-506: sc built from
    mean neural-point features instead of raw max-z only)."""
    x, y = points_local[:, 0], points_local[:, 1]
    r = np.sqrt(x * x + y * y)
    theta = np.arctan2(y, x) + np.pi
    ring = np.minimum((r / max_dist * num_rings).astype(np.int64),
                      num_rings - 1)
    sector = np.minimum((theta / (2 * np.pi) * num_sectors).astype(np.int64),
                        num_sectors - 1)
    ok = (r < max_dist) & (r > 1e-3)
    F = feats.shape[1]
    acc = np.zeros((num_rings * num_sectors, F), np.float32)
    cnt = np.zeros(num_rings * num_sectors, np.float32)
    bins = ring[ok] * num_sectors + sector[ok]
    np.add.at(acc, bins, feats[ok])
    np.add.at(cnt, bins, 1.0)
    mean = acc / np.maximum(cnt, 1.0)[:, None]
    return mean.reshape(num_rings, num_sectors, F)


def ring_key(sc: np.ndarray) -> np.ndarray:
    """Rotation-invariant prefilter key: row occupancy mean."""
    if sc.ndim == 3:
        sc = np.abs(sc).sum(-1)
    return (sc != 0).mean(axis=1)


def sc_distance(sc1: np.ndarray, sc2: np.ndarray) -> Tuple[float, int]:
    """Column-shift cosine distance; returns (min distance, shift) where
    the shift estimates relative yaw (loop_detector.py:218-270).

    All ``ns`` column shifts are evaluated at once: the per-shift
    column-cosine matrix is one (R, ns) x (R, ns, ns-gather) einsum
    instead of a Python roll loop (reference-scale maps query thousands
    of nodes per frame — VERDICT r2)."""
    if sc1.ndim == 3:   # feature contexts: fold channels into rows
        sc1 = sc1.transpose(0, 2, 1).reshape(-1, sc1.shape[1])
        sc2 = sc2.transpose(0, 2, 1).reshape(-1, sc2.shape[1])
    ns = sc1.shape[1]
    # shifted[s] = np.roll(sc2, s, axis=1)  ==  sc2[:, (c - s) % ns]
    idx = (np.arange(ns)[None, :] - np.arange(ns)[:, None]) % ns  # (s, c)
    sc2_sh = sc2[:, idx]                        # (R, ns_shift, ns_col)
    n1 = np.linalg.norm(sc1, axis=0)            # (c,)
    n2 = np.linalg.norm(sc2_sh, axis=0)         # (s, c)
    dot = np.einsum("rc,rsc->sc", sc1, sc2_sh)  # (s, c)
    cos = dot / ((n1[None, :] + 1e-9) * (n2 + 1e-9))
    valid = (n1[None, :] > 0) & (n2 > 0)        # (s, c)
    nv = valid.sum(axis=1)
    with np.errstate(invalid="ignore"):
        d = 1.0 - np.where(valid, cos, 0.0).sum(axis=1) / np.maximum(nv, 1)
    d = np.where(nv > 0, d, np.inf)
    s = int(np.argmin(d))
    if not np.isfinite(d[s]):
        return (np.inf, 0)
    return (float(d[s]), s)


@dataclasses.dataclass
class ContextNode:
    frame_id: int
    sc: np.ndarray           # (V, R, S) with V virtual side nodes
    rk: np.ndarray           # (V, R)
    side_offsets: np.ndarray  # (V,) lateral offsets (m), 0 = central


class ScanContextManager:
    """Reference NeuralPointMapContextManager (loop_detector.py:44-334)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.num_rings, self.num_sectors = cfg.context_shape
        self.max_dist = cfg.npmc_max_dist
        self.nodes: List[ContextNode] = []
        self.virtual_count = cfg.context_virtual_side_count
        self.virtual_step = cfg.context_virtual_step_m
        self.with_feature = getattr(cfg, "loop_with_feature", False)
        # stacked ring-key / frame-id caches for the vectorized prefilter
        self._rk_all: Optional[np.ndarray] = None    # (M, V, R)
        self._fid_all: Optional[np.ndarray] = None   # (M,)

    def _describe(self, points_local: np.ndarray,
                  feats: Optional[np.ndarray]) -> np.ndarray:
        if self.with_feature and feats is not None:
            return scan_context_feature(points_local, feats, self.num_rings,
                                        self.num_sectors, self.max_dist)
        return scan_context(points_local, self.num_rings, self.num_sectors,
                            self.max_dist)

    def add_node(self, frame_id: int, points_local: np.ndarray,
                 feats: Optional[np.ndarray] = None):
        """Add descriptors for the frame; virtual side nodes shift the
        cloud laterally (±y) to tolerate revisit offsets
        (loop_detector.py:79-152). ``feats`` (N, F) switches to
        feature-augmented contexts when cfg.loop_with_feature."""
        offs = [0.0]
        for i in range(1, self.virtual_count + 1):
            offs += [i * self.virtual_step, -i * self.virtual_step]
        scs, rks = [], []
        for off in offs:
            shifted = points_local + np.array([0.0, off, 0.0], np.float32)
            sc = self._describe(shifted, feats)
            scs.append(sc)
            rks.append(ring_key(sc))
        self.nodes.append(ContextNode(
            frame_id, np.stack(scs), np.stack(rks),
            np.array(offs, np.float32)))
        self._rk_all = None   # invalidate the stacked prefilter cache

    def detect_global_loop(
        self, points_local: np.ndarray, cur_frame_id: int,
        exclude_recent_frames: int = 30,
        feats: Optional[np.ndarray] = None,
    ) -> Optional[Tuple[int, float, float, float]]:
        """Query the database. Returns (frame_id, cos_dist, yaw_rad,
        side_offset_m) of the best candidate under the threshold."""
        if not self.nodes:
            return None
        q_sc = self._describe(points_local, feats)
        q_rk = ring_key(q_sc)
        # vectorized ring-key prefilter over all (node, virtual) pairs
        if self._rk_all is None:
            self._rk_all = np.stack([n.rk for n in self.nodes])
            self._fid_all = np.array([n.frame_id for n in self.nodes])
        d_rk = np.abs(self._rk_all - q_rk[None, None, :]).mean(-1)  # (M, V)
        recent = (cur_frame_id - self._fid_all) < exclude_recent_frames
        d_rk[recent] = np.inf
        v_best = d_rk.argmin(axis=1)
        d_best = d_rk[np.arange(len(self.nodes)), v_best]
        n_try = max(self.cfg.context_num_candidates, 1) * 3
        order = np.argsort(d_best)[:n_try]
        best = None
        for m in order:
            if not np.isfinite(d_best[m]):
                break
            node, v = self.nodes[int(m)], int(v_best[m])
            d, shift = sc_distance(node.sc[v], q_sc)
            if best is None or d < best[0]:
                yaw = shift / self.num_sectors * 2 * np.pi
                if yaw > np.pi:
                    yaw -= 2 * np.pi
                best = (d, node.frame_id, yaw, float(node.side_offsets[v]))
        if best is None or best[0] > self.cfg.context_cosdist_threshold:
            return None
        return best[1], best[0], best[2], best[3]


def detect_local_loop(
    poses: List[np.ndarray],
    frame_ids: List[int],
    travel_dists: List[float],
    cur_idx: int,
    drift_estimate: float,
    cfg,
) -> Optional[Tuple[int, float]]:
    """Distance-based candidate: the closest previous pose that is far in
    travel distance but near in space (loop_detector.py:404-440).
    Returns (frame_id, distance)."""
    if cur_idx == 0:
        return None
    cur_pos = poses[cur_idx][:3, 3]
    cur_travel = travel_dists[cur_idx]
    min_travel_gap = cfg.min_loop_travel_dist_ratio * cfg.max_range
    pos = np.stack([p[:3, 3] for p in poses[:cur_idx]])
    trav = np.asarray(travel_dists[:cur_idx])
    d = np.linalg.norm(pos - cur_pos[None, :], axis=1)
    d = np.where(cur_travel - trav >= min_travel_gap, d, np.inf)
    i = int(np.argmin(d))
    if d[i] < cfg.max_loop_dist + drift_estimate:
        return (frame_ids[i], float(d[i]))
    return None
