"""The full SLAM system: the per-frame loop tying every subsystem together.

Reference: pings.py:249-489 (frame loop) and :539-610 (loop-closure
driver): read/preprocess -> SDF odometry -> loop detection + PGO + map
adjustment -> neural-point update -> SDF (+ joint GS) mapping -> health
bookkeeping -> final results.

State-synchronization model (TPU design): the map and decoders live in two
views — ``self.m``/``self.decoders`` (the authoritative post-training
state used by the tracker, mesher, renderer) and the optimizer param
pytree (the trainable leaves). Each frame: params are re-extracted after
map insertion (insertion rewrites feature rows of new points), trained,
then applied back. Optimizer moments persist across frames.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pings_tpu.data.frame import (
    PreprocessedFrame, colorize_scan, preprocess_frame, project_scan_to_cam,
)
from pings_tpu.mapping import gs_mapper, pool as rp, sdf_mapper
from pings_tpu.mapping.campool import CamPool
from pings_tpu.mapping.sampler import sample_rays_cfg
from pings_tpu.models import decoder as dec, field, neural_points as npm
from pings_tpu.models.renderer import CamView
from pings_tpu.odometry.tracker import Tracker
from pings_tpu.ops import transforms as tf
from pings_tpu.slam.loop_detector import ScanContextManager, detect_local_loop
from pings_tpu.slam.pgo import PoseGraph
from pings_tpu.utils import pose as hp

MAX_FRAMES = 100000


class FrameReport:
    def __init__(self):
        self.frame_id = 0
        self.pose = np.eye(4)
        self.tracking_valid = True
        self.loop_closed = False
        self.n_points = 0
        self.timings: Dict[str, float] = {}
        self.metrics: Dict[str, float] = {}


class SlamSystem:
    def __init__(self, cfg, seed: Optional[int] = None):
        self.cfg = cfg
        key = jax.random.PRNGKey(seed if seed is not None else cfg.seed)
        km, kd = jax.random.split(key)
        self.m = npm.init_map(cfg, km)
        self.decoders = dec.init_decoders(kd, cfg)
        self.pool = rp.init_pool(cfg.pool_capacity)
        self.tracker = Tracker(cfg) if cfg.track_on else None
        self.pgo = PoseGraph(cfg) if cfg.pgo_on else None
        self.sc = ScanContextManager(cfg) if cfg.pgo_on else None
        self.campool = CamPool(cfg) if cfg.gs_on else None
        if self.campool:
            self.exposure, self.cam_delta = self.campool.init_param_pools()
        self.rng = np.random.default_rng(cfg.seed)
        self._key = jax.random.PRNGKey(cfg.seed + 1)
        # merged world-frame cloud accumulator (reference merged-cloud
        # writer, slam_dataset.py:995-1195), gated by cfg.save_merged_pc
        self._merged_pc: List[np.ndarray] = []
        # (depth, K, T_c_w, rgb) per keyframe for end-of-run TSDF fusion
        self.tsdf_frames: List[tuple] = []
        self.mono_provider = None
        if cfg.mono_depth_on:
            from pings_tpu.data.monodepth import make_provider
            self.mono_provider = make_provider(cfg.mono_depth_provider)

        self.poses: List[np.ndarray] = []       # post-PGO odom poses (f64)
        self.odom_only_poses: List[np.ndarray] = []
        self.travel: List[float] = []
        self.travel_dev = jnp.zeros(MAX_FRAMES)
        self.T_rel_last = np.eye(4)
        self.frame_id = -1
        self.lose_track_count = 0
        self.aborted = False
        self.abort_reason = ""
        self.n_loops = 0
        self.n_loops_uninformative = 0
        self.loop_events: List[dict] = []   # per-attempt audit trail
        self._last_track_res = float("nan")  # this frame's odometry res
        self._last_loop_fid = -(10 ** 9)
        self._odom_noise_rng = np.random.default_rng(cfg.odom_noise_seed)
        # robot-stop detection (reference slam_dataset.py:709-721)
        self.stop_count = 0
        self.stop_status = False
        # new-observation ratio -> adaptive iters (reference mapper.py:447-513)
        self.new_obs_ratio = 1.0
        self._sur_mask = None     # surrounding annulus of the local map

        # lazy-built jitted steps / optimizers
        self._sdf = None          # (opt, params, opt_state, step)
        self._map_update_step = None
        self._gs = None           # (opt, params, opt_state, {shape: step})
        self._local_size = cfg.max_local_points

    # -- helpers ------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _ensure_sdf(self):
        if self._sdf is None:
            opt, params, state = sdf_mapper.init_sdf_train(
                self.m, self.decoders, self.cfg)
            step = sdf_mapper.make_sdf_scan_step(self.cfg, opt)
            self._sdf = [opt, params, state, step]

    def _ensure_gs(self, width: int, height: int):
        if self._gs is None:
            opt = gs_mapper.make_gs_optimizer(self.cfg)
            params = gs_mapper.gs_params(self.m, self.decoders,
                                         self.exposure, self.cam_delta)
            state = opt.init(params)
            self._gs = [opt, params, state, {}]
        steps = self._gs[3]
        if (width, height) not in steps:
            steps[(width, height)] = gs_mapper.make_gsdf_step(
                self.cfg, self._gs[0], width, height, self._local_size)
        return steps[(width, height)]

    def _sync_params_from_map(self):
        """Re-extract trainable leaves after map mutation."""
        if self._sdf is not None:
            self._sdf[1] = sdf_mapper.sdf_params(self.m, self.decoders,
                                                 self.cfg.semantic_on)
        if self._gs is not None:
            self._gs[1] = gs_mapper.gs_params(self.m, self.decoders,
                                              self.exposure, self.cam_delta)

    def _apply_sdf_params(self):
        self.m, self.decoders = sdf_mapper.apply_sdf_params(
            self.m, self.decoders, self._sdf[1])

    def _apply_gs_params(self):
        self.m, self.decoders = gs_mapper.apply_gs_params(
            self.m, self.decoders, self._gs[1])
        p = self._gs[1]
        self.exposure = p["exposure"]
        self.cam_delta = p["cam_delta"]

    # -- the frame loop -----------------------------------------------------
    def process_frame(self, frame: dict) -> FrameReport:
        cfg = self.cfg
        rep = FrameReport()
        self.frame_id += 1
        rep.frame_id = fid = self.frame_id
        t0 = time.time()

        pre = preprocess_frame(frame, cfg, self.T_rel_last, cfg.deskew)
        rep.timings["preprocess"] = time.time() - t0

        # ---------- II. odometry ----------
        t1 = time.time()
        if fid == 0:
            T = pre.gt_pose if (pre.gt_pose is not None
                                and not cfg.track_on) else np.eye(4)
            if pre.gt_pose is not None and cfg.track_on:
                T = pre.gt_pose  # anchor world frame at GT start
            self.poses.append(np.asarray(T, np.float64))
            self.odom_only_poses.append(self.poses[0].copy())
            self.travel.append(0.0)
        else:
            T_guess = self.poses[-1] @ self.T_rel_last
            if cfg.track_on:
                res = self.tracker.track(
                    self.m, self.decoders, pre.source_points,
                    pre.source_mask, T_guess,
                    source_intensity=pre.source_intensity
                    if cfg.photometric_loss_on else None)
                rep.tracking_valid = res.valid and not res.degenerate
                T = res.T_w_l if rep.tracking_valid else T_guess
                rep.metrics["track_res_m"] = res.mean_res
                self._last_track_res = float(res.mean_res)
                rep.metrics["track_iter"] = res.iterations
                rep.metrics["track_valid_ratio"] = res.valid_ratio
                rep.metrics["track_degen"] = float(res.degenerate)
            else:
                T = pre.gt_pose if pre.gt_pose is not None else T_guess
                rep.tracking_valid = True
            # single-frame-jump abort (reference slam_dataset.py:733-740):
            # a per-frame translation beyond 40 x surface_sample_range_m is
            # never physical — do NOT commit the pose (fall back to the
            # motion-model guess so T_rel_last stays bounded) and stop the
            # run so results are written before the failure point. This is
            # the guard whose absence let the round-3 kitti run compound a
            # finite-but-wild pose exponentially into NaN.
            if cfg.track_on:
                jump = float(np.linalg.norm(
                    (hp.se3_inv(self.poses[-1]) @ T)[:3, 3]))
                if jump > 40.0 * cfg.surface_sample_range_m:
                    rep.tracking_valid = False
                    T = T_guess
                    self.aborted = True
                    self.abort_reason = (
                        f"too large translation in one frame "
                        f"({jump:.2f} m > "
                        f"{40.0 * cfg.surface_sample_range_m:.2f} m)")
            if not rep.tracking_valid:
                self.lose_track_count += 1
                if self.lose_track_count > cfg.lose_track_abort_n:
                    self.aborted = True
                    if not self.abort_reason:
                        self.abort_reason = (
                            "lose track for more than "
                            f"{cfg.lose_track_abort_n} consecutive frames")
            else:
                self.lose_track_count = 0
            if cfg.odom_noise_std_per_m > 0 and rep.tracking_valid:
                # validation-only random-walk odometry corruption: scale
                # per-edge noise with edge motion so the accumulated
                # drift is a true random walk (emulates the km-scale
                # regime where loop closures pay, VERDICT r4 item 3)
                T_prev_inv = hp.se3_inv(self.poses[-1])
                d = float(np.linalg.norm((T_prev_inv @ T)[:3, 3]))
                rng = self._odom_noise_rng
                xi = np.concatenate([
                    rng.normal(0, cfg.odom_noise_std_per_m * d, 3),
                    rng.normal(0, np.radians(
                        cfg.odom_noise_rot_deg_per_m) * d, 3)])
                T = np.asarray(T, np.float64) @ hp.se3_exp(xi)
            self.T_rel_last = hp.se3_inv(self.poses[-1]) @ T
            self.poses.append(np.asarray(T, np.float64))
            self.odom_only_poses.append(
                self.odom_only_poses[-1] @ self.T_rel_last)
            step_d = float(np.linalg.norm(self.T_rel_last[:3, 3]))
            self.travel.append(self.travel[-1] + step_d)
            # robot-stop detection: consecutive near-identity odometry
            # steps throttle mapping (reference tranmat_close_to_identity
            # gate, slam_dataset.py:709-721; rot tol 1e-3, tran tol
            # 0.1 * voxel size)
            rot_close = float(np.abs(self.T_rel_last[:3, :3]
                                     - np.eye(3)).max()) < 1e-3
            tran_close = step_d < 0.1 * cfg.voxel_size_m
            self.stop_count = (self.stop_count + 1
                               if (rot_close and tran_close) else 0)
            self.stop_status = self.stop_count > cfg.stop_frame_thre
        self.travel_dev = self.travel_dev.at[fid].set(self.travel[-1])
        rep.pose = self.poses[-1]
        rep.timings["tracking"] = time.time() - t1

        # ---------- III. loop closure ----------
        t2 = time.time()
        if self.pgo is not None:
            self.pgo.add_frame_node(fid, self.poses[-1])
            if fid > 0:
                self.pgo.add_odometry_factor(fid - 1, fid, self.T_rel_last)
            src_np = pre.source_points[pre.source_mask]
            src_feats = self._context_feats(src_np) \
                if cfg.loop_with_feature else None
            if fid % max(cfg.local_map_context_latency, 1) == 0:
                self.sc.add_node(fid, src_np, feats=src_feats)
            # cooldown after a successful loop (reference pgo_freq,
            # pings.py:564): a revisit segment would otherwise close a
            # loop every frame, re-optimizing the graph + re-posing the
            # map dozens of times
            cooled = fid - self._last_loop_fid > cfg.pgo_freq_frame
            if fid > 10 and rep.tracking_valid and cooled:
                rep.loop_closed = self._try_loops(pre, fid, src_np,
                                                  src_feats)
                if rep.loop_closed:
                    self._last_loop_fid = fid
        rep.timings["loop"] = time.time() - t2

        # ---------- IV. map update + SDF supervision ----------
        # a stopped robot adds no new observations: skip the map update
        # (reference pings.py:308) except during startup
        t3 = time.time()
        do_update = (rep.tracking_valid and not self.aborted
                     and (not self.stop_status or fid < 5))
        if do_update:
            self._map_update(pre, fid, rep)
        rep.timings["map_update"] = time.time() - t3

        # ---------- V. training ----------
        t4 = time.time()
        if rep.tracking_valid and not self.aborted:
            self._train(pre, fid, rep)
        rep.timings["training"] = time.time() - t4
        rep.n_points = int(self.m.count)
        if os.environ.get("PINGS_DEBUG_FINITE"):
            v = self.m.valid_mask[:, None]
            rep.metrics["dbg_geo_bad"] = int(jnp.sum(
                ~jnp.isfinite(self.m.geo_feat) & v))
            rep.metrics["dbg_pos_bad"] = int(jnp.sum(
                ~jnp.isfinite(self.m.positions) & v))
            rep.metrics["dbg_dec_bad"] = int(sum(
                jnp.sum(~jnp.isfinite(x))
                for x in jax.tree.leaves(self.decoders)))
        return rep

    def merged_point_cloud(self) -> np.ndarray:
        """(M, 6) xyz+rgb merged downsampled world-frame cloud
        (requires cfg.save_merged_pc)."""
        if not self._merged_pc:
            return np.zeros((0, 6), np.float32)
        return np.concatenate(self._merged_pc)

    # -- loop closure internals ---------------------------------------------
    def _context_feats(self, src_np: np.ndarray) -> np.ndarray:
        """Neural-point geo features interpolated at the scan points, for
        feature-augmented scan contexts (reference loop_with_feature,
        loop_detector.py:461-506: contexts built from neural-point
        features). Points are in the sensor frame; features are queried in
        the world frame at the current pose estimate."""
        T = self.poses[-1]
        pts_w = (src_np @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        q = npm.query_feature(self.m, jnp.asarray(pts_w),
                              k=self.cfg.query_nn_k,
                              stencil_r=self.cfg.num_nei_cells,
                              search_alpha=self.cfg.search_alpha)
        feat = jnp.sum(self.m.geo_feat[q.nn_idx] * q.weights[..., None],
                       axis=-2)
        return np.asarray(jnp.where(q.valid[:, None], feat, 0.0))

    def _try_loops(self, pre: PreprocessedFrame, fid: int,
                   src_np: np.ndarray,
                   src_feats: Optional[np.ndarray] = None) -> bool:
        cfg = self.cfg
        drift = self.pgo.estimate_drift(self.travel[-1])
        cand = detect_local_loop(self.poses, list(range(len(self.poses))),
                                 self.travel, fid, drift, cfg)
        init_T = None
        cand_fid = None
        hit = None
        if cand is not None:
            cand_fid = cand[0]
            # r5: init the verification at the CURRENT pose estimate, not
            # the candidate's pose. The loop registration measures the
            # accumulated drift against the revisited (old) geometry, and
            # drift is meters at most — while the candidate can sit
            # max_loop_dist (8 m+) away. The 20260822_081947 audit trail
            # showed candidate-pose inits stalling near the init on the
            # self-similar corridor (Geman-McClure downweights everything
            # from a far init): T_loop tracked poses[cand] and the
            # "correction" was literally the distance to the candidate
            # (11 -> 2 m over frames 219-226), which PGO then smeared.
            # Scan-context (global) candidates keep the candidate-pose
            # init: they exist for relocalization-scale drift where the
            # current estimate is the thing that cannot be trusted.
            init_T = self.poses[-1].copy()
        elif cfg.local_map_context and self.sc is not None:
            hit = self.sc.detect_global_loop(src_np, fid, feats=src_feats)
            if hit is not None:
                cand_fid, sc_dist, yaw, side = hit
                T_c = self.poses[cand_fid].copy()
                adj = np.eye(4)
                adj[:3, :3] = hp.so3_exp(np.array([0, 0, -yaw]))
                adj[:3, 3] = [0.0, -side, 0.0]
                init_T = T_c @ adj
        if cand_fid is None:
            return False
        ev = {"frame": fid, "cand": int(cand_fid),
              "source": "local" if cand is not None else "scan_context",
              "drift_est_m": round(drift, 3)}
        if cand is None and hit is not None:
            ev["sc_cosdist"] = round(float(sc_dist), 4)
        self.loop_events.append(ev)

        def _reject(why: str) -> bool:
            ev["decision"] = why
            self.m = npm.recreate_hash(self.m)
            return False
        # re-bucket the hash around the loop context so verification
        # registers against the *revisited* (old) geometry, then verify by
        # scan-to-map registration from the candidate pose (reference
        # recreate_hash-at-loop, pings.py:576-610); restore the
        # recency-preferring hash if the loop is rejected
        self.m = npm.recreate_hash(self.m, jnp.int32(cand_fid))
        res = self.tracker.track(self.m, self.decoders, pre.source_points,
                                 pre.source_mask, init_T,
                                 max_iter=cfg.reg_iter_n) \
            if self.tracker else None
        if res is None or not res.valid or res.degenerate:
            return _reject("registration_invalid")
        T_loop = res.T_w_l  # corrected world pose of the current frame
        ev["reg_res_m"] = round(float(res.mean_res), 4)
        ev["odom_res_m"] = round(self._last_track_res, 4)
        # drift-consistency gate: the loop's implied pose correction must
        # be explainable by odometry drift (1%/m of travel since the last
        # loop + a floor). Scan-context matching in self-similar corridors
        # can hallucinate a loop whose scan-to-map verification ALSO
        # converges (registration against repetitive geometry) — measured
        # in the first circuit run: a false loop at ~frame 120 claimed a
        # 30 m correction after 125 m of travel (24% "drift"), passed the
        # PGO residual test, and warped both the graph and the re-posed
        # map beyond recovery. Reference counterpart: drift-radius gating
        # of loop candidates (loop_detector.py:404-440, pgo drift model
        # pgo.py:321-336).
        corr_tr = float(np.linalg.norm(T_loop[:3, 3] - self.poses[-1][:3, 3]))
        corr_rot = hp.rotation_angle_deg(
            self.poses[-1][:3, :3].T @ T_loop[:3, :3])
        ev["corr_tr_m"] = round(corr_tr, 3)
        ev["corr_rot_deg"] = round(float(corr_rot), 3)
        drift_bound = max(2.0, 3.0 * drift)
        # rotational drift bound (r5, config.pgo_loop_rot_floor_deg): the
        # previous fixed 20 deg ceiling admitted a loop factor with a
        # multi-degree yaw error that PGO then rotated through the whole
        # chain (lever arm: 2 deg at 100 m displaces poses by 3.5 m)
        travel_since = max(self.travel[-1] - self.pgo.travel_dist_at_loop,
                           0.0)
        rot_bound = max(cfg.pgo_loop_rot_floor_deg,
                        3.0 * cfg.pgo_drift_rot_deg_per_m * travel_since)
        if corr_tr > drift_bound:
            return _reject("drift_bound")
        if cfg.pgo_loop_rot_floor_deg > 0 and corr_rot > rot_bound:
            return _reject("rot_bound")
        # residual-ratio gate (r5, config.pgo_max_loop_res_ratio): a true
        # revisit registers against the SAME physical geometry the
        # odometry just registered against, so its weighted residual must
        # be comparable; a mis-locked match on self-similar structure
        # converges with a clearly higher one
        if (cfg.pgo_max_loop_res_ratio > 0
                and np.isfinite(self._last_track_res)
                and float(res.mean_res)
                > cfg.pgo_max_loop_res_ratio * self._last_track_res):
            return _reject("res_ratio")
        # informativeness (SNR) gate: a correction of the same order as
        # the loop's own registration noise cannot improve the
        # trajectory — applying it redistributes systematic drift into a
        # worse one (measured r4: SLAM 1.99 m vs odometry 0.21 m on the
        # 280 m circuit; a GT-perfect factor still landed at 0.40 m).
        # Config rationale at config.pgo_min_loop_snr.
        if (cfg.pgo_min_loop_snr > 0
                and corr_tr < cfg.pgo_min_loop_snr * cfg.pgo_tran_std):
            self.n_loops_uninformative += 1
            return _reject("uninformative")
        T_i_j = hp.se3_inv(self.poses[cand_fid]) @ T_loop
        old_poses = [p.copy() for p in self.pgo.poses]
        if not self.pgo.try_loop_closure(cand_fid, fid, T_i_j):
            return _reject("pgo_residual")
        # apply corrections: poses, map, pool
        deltas = self.pgo.pose_deltas(old_poses)
        self.poses = [p.copy() for p in self.pgo.poses]
        pad = np.tile(np.eye(4), (MAX_FRAMES - len(deltas), 1, 1))
        deltas_full = np.concatenate([deltas, pad]).astype(np.float32)
        dd = jnp.asarray(deltas_full)
        self.m = npm.recreate_hash(npm.adjust_map(self.m, dd))
        self.pool = _transform_pool(self.pool, dd)
        self._sync_params_from_map()
        # refresh pooled keyframe extrinsics from corrected poses
        # (reference update_poses_cam_pool, pings.py:604)
        if self.campool is not None:
            for pc in self.campool.all_cams():
                if pc.T_c_l is not None and pc.frame_id < len(self.poses):
                    T_c_w = pc.T_c_l @ hp.se3_inv(self.poses[pc.frame_id])
                    pc.set_cam(pc.cam._replace(
                        T_c_w=jnp.asarray(T_c_w, jnp.float32)))
        self.pgo.travel_dist_at_loop = self.travel[-1]
        self.n_loops += 1
        ev["decision"] = "applied"
        self.T_rel_last = hp.se3_inv(self.poses[-2]) @ self.poses[-1] \
            if len(self.poses) > 1 else np.eye(4)
        return True

    # -- mapping internals ----------------------------------------------------
    def _ensure_map_update(self):
        """ONE jitted dispatch for the whole map-update stage: dynamic
        filter -> insert -> local mask -> (scan-normal incidence) ->
        ray sampling -> pool insert -> endpoint query -> certainty +
        new-observation counts. r4 measured this stage at 3.4 s/frame on
        replica (24 % of wall) across >= 6 separate dispatches and a
        host sync each — on the tunneled TPU the ~30 ms dispatch latency
        dominates (VERDICT r4 item 6; memory: tpu-tunnel-dispatch
        economics)."""
        if self._map_update_step is not None:
            return self._map_update_step
        cfg = self.cfg
        from pings_tpu.mapping.sampler import sample_rays_cfg
        from pings_tpu.mapping import pool as rp
        incid_on = (cfg.incidence_weight_on
                    and cfg.incidence_source == "scan")
        dyn_on = cfg.dynamic_filter_on
        sigma_s = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
        thre = cfg.local_map_travel_dist_ratio * cfg.local_map_radius

        @jax.jit
        def step(m, pool, decoders, pts, cols, mask, fid, travel_dev,
                 origin, key, sem):
            if dyn_on:
                dyn = field.dynamic_points(
                    m, decoders, pts, sigma_s,
                    cfg.dynamic_certainty_thre, cfg.dynamic_sdf_ratio_thre,
                    k=cfg.query_nn_k, stencil_r=cfg.num_nei_cells,
                    search_alpha=cfg.search_alpha)
                mask = mask & ~(dyn & (fid > 0))
            m = npm.insert_points(
                m, pts, cols, mask,
                jnp.tile(jnp.array([1.0, 0, 0, 0]), (pts.shape[0], 1)),
                fid, travel_dev, jnp.float32(thre))
            local, sur = npm.compute_local_mask(
                m, origin, fid, travel_dev,
                jnp.float32(cfg.local_map_radius), jnp.float32(thre),
                cfg.use_mid_ts, max_local=cfg.max_local_points,
                max_surround=cfg.max_surrounding_points)
            m = m.replace(local_mask=local)
            incid = None
            if incid_on:
                from pings_tpu.ops.scan_normals import scan_incidence_cos
                incid, _ = scan_incidence_cos(
                    pts, mask, origin, voxel=cfg.incidence_normal_voxel_m)
            k_s, k_p = jax.random.split(key)
            s = sample_rays_cfg(k_s, pts, cols, mask, origin, cfg,
                                sem_labels=sem, incid_cos=incid)
            pool = rp.pool_insert(pool, s, fid, k_p)
            q = npm.query_feature(m, pts, k=cfg.query_nn_k,
                                  stencil_r=cfg.num_nei_cells,
                                  search_alpha=cfg.search_alpha)
            cert_blend = jnp.sum(m.certainty[q.nn_idx] * q.weights,
                                 axis=-1)
            n_valid = jnp.sum(mask)
            n_new = jnp.sum(mask
                            & (cert_blend < cfg.new_certainty_thre))
            m = npm.accumulate_certainty(m, q)
            return m, pool, sur, n_valid, n_new

        self._map_update_step = step
        return step

    def _map_update(self, pre: PreprocessedFrame, fid: int, rep: FrameReport):
        cfg = self.cfg
        T = self.poses[-1]
        pts_w = (pre.points_l @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        mask = pre.mask.copy()
        colors = pre.colors.copy()

        # colorize scan from cameras (reference
        # project_pointcloud_to_cams, pings.py:301)
        valid_color = np.zeros(len(pts_w), bool)
        if cfg.save_tsdf_mesh and fid % max(cfg.gs_keyframe_interval, 1) == 0:
            for cam, cd in pre.cams.items():
                if cd.get("depth") is not None:
                    self.tsdf_frames.append((
                        np.asarray(cd["depth"], np.float32),
                        np.asarray(cd["K"], np.float64),
                        np.asarray(cd["T_c_l"], np.float64) @ hp.se3_inv(T),
                        np.asarray(cd["img"])))
        for cam, cd in pre.cams.items():
            # camera shutter offset: slerp the body pose to the camera's
            # timestamp (reference per-camera slerp_pose,
            # slam_dataset.py:821-836)
            T_cam_t = T
            frac = float(cd.get("ts_frac", 0.0) or 0.0)
            if frac != 0.0 and len(self.poses) >= 2:
                T_cam_t = hp.slerp_pose(self.poses[-2], T, 1.0 + frac)
            T_c_w = np.asarray(cd["T_c_l"], np.float64) @ hp.se3_inv(T_cam_t)
            c, v = colorize_scan(pts_w, mask, T_c_w, cd["K"], cd["img"])
            new = v & ~valid_color
            colors[new] = c[new]
            valid_color |= new

        jm = jnp.asarray(mask)
        jp = jnp.asarray(pts_w)
        jc = jnp.asarray(colors)
        if cfg.save_merged_pc:
            keep = np.asarray(tf.voxel_down_sample_mask(
                jp, jm, cfg.vox_down_m * 2.0))
            self._merged_pc.append(np.concatenate(
                [pts_w[keep], colors[keep]], axis=1).astype(np.float32))
        # the whole device-side stage (dynamic filter, insert, local
        # mask, sampling, pool insert, certainty + new-obs counts) is
        # ONE fused dispatch — see _ensure_map_update
        origin = T[:3, 3].astype(np.float32)
        sem_l = (jnp.asarray(pre.sem) if cfg.semantic_on
                 and pre.sem is not None else None)
        step = self._ensure_map_update()
        self.m, self.pool, self._sur_mask, n_valid, n_new = step(
            self.m, self.pool, self.decoders, jp, jc, jm,
            jnp.int32(fid), self.travel_dev, jnp.asarray(origin),
            self._next_key(), sem_l)
        if fid > 0:
            self.new_obs_ratio = float(n_new) / max(float(n_valid), 1.0)

    def _adaptive_offset(self, fid: int) -> int:
        """Iteration offset from the new-observation ratio (reference
        mapper.py:499-512: -5 when little is new, +5 when a lot is, +10
        when so much is new that tracking may have been lost)."""
        cfg = self.cfg
        if not (cfg.adaptive_iters and cfg.new_obs_ratio_based_iters
                and fid > 0):
            return 0
        r = self.new_obs_ratio
        if r < cfg.new_sample_ratio_less:
            return -5
        if r > cfg.new_sample_ratio_more:
            if (fid > cfg.freeze_after_frame
                    and r > cfg.new_sample_ratio_restart):
                return 10
            return 5
        return 0

    def _train(self, pre: PreprocessedFrame, fid: int, rep: FrameReport):
        cfg = self.cfg
        self._ensure_sdf()
        self._sync_params_from_map()
        freeze = jnp.asarray(fid >= cfg.freeze_after_frame)
        iters = cfg.mapping_iters
        if fid == 0:
            iters = cfg.mapping_iters * cfg.init_iter_ratio
        else:
            iters = iters + self._adaptive_offset(fid)
            if self.stop_status:
                # stopped robot: train barely (reference pings.py:328-329)
                iters = max(1, iters - 10)
        rep.metrics["new_obs_ratio"] = self.new_obs_ratio
        rep.metrics["sdf_iters"] = max(iters, 0)
        opt, params, state, step = self._sdf
        do_sdf_only = (not cfg.gs_on) or fid == 0 or not pre.cams
        if do_sdf_only and iters > 0:
            # the whole frame's SDF loop is ONE dispatch (batches drawn
            # inside the scan from the device-side replay pool)
            params, state, mets = step(params, state, self.pool,
                                       self._next_key(), self.m,
                                       self.decoders, freeze,
                                       iters=int(iters))
            self._sdf[1], self._sdf[2] = params, state
            self._apply_sdf_params()
            rep.metrics["sdf_bce"] = float(mets.bce[-1])

        if cfg.gs_on and pre.cams:
            self._train_gs(pre, fid, rep, freeze)

    def _reset_cam_slot(self, slot: int):
        """Zero a recycled keyframe slot's exposure/cam-delta trainables
        and Adam moments (reference per-camera param reset on pool
        eviction; without it a new keyframe inherits the previous
        occupant's trained exposure/pose delta)."""
        pseudo = {"exposure": self.exposure, "cam_delta": self.cam_delta}
        opt_state = self._gs[2] if self._gs is not None else None
        pseudo, opt_state = gs_mapper.reset_keyframe_slot(
            pseudo, opt_state, slot)
        self.exposure = pseudo["exposure"]
        self.cam_delta = pseudo["cam_delta"]
        if self._gs is not None:
            self._gs[2] = opt_state
            p = dict(self._gs[1])
            p["exposure"] = self.exposure
            p["cam_delta"] = self.cam_delta
            self._gs[1] = p

    def _train_gs(self, pre: PreprocessedFrame, fid: int, rep: FrameReport,
                  freeze):
        cfg = self.cfg
        T = self.poses[-1]
        # register keyframes; held-out eval frames never become keyframes
        # (reference train_view=False cameras stay out of GS training,
        # utils/mapper.py:669)
        held_out = (cfg.gs_eval_hold_out_every > 0
                    and fid % cfg.gs_eval_hold_out_every == 0)
        if fid % max(cfg.gs_keyframe_interval, 1) == 0 and not held_out:
            for cam_name, cd in pre.cams.items():
                img = np.asarray(cd["img"], np.float32) / 255.0
                h, w = img.shape[:2]
                T_c_w = np.asarray(cd["T_c_l"], np.float64) @ hp.se3_inv(T)
                depth = cd.get("depth")
                if depth is None:
                    pts_w = (pre.points_l @ T[:3, :3].T + T[:3, 3]).astype(
                        np.float32)
                    depth = project_scan_to_cam(pts_w, pre.mask, T_c_w,
                                                cd["K"], w, h)
                sky = cd.get("sky")
                if self.mono_provider is not None:
                    from pings_tpu.data.monodepth import densify_depth
                    depth, mono_sky = densify_depth(
                        cd["img"], np.asarray(depth),
                        self.mono_provider, max_depth=cfg.max_range)
                    if sky is None:
                        sky = mono_sky.astype(np.float32)
                cam = CamView(
                    K=jnp.asarray(cd["K"], jnp.float32),
                    T_c_w=jnp.asarray(T_c_w, jnp.float32),
                    rgb=jnp.asarray(img),
                    depth=jnp.asarray(depth),
                    sky=jnp.asarray(sky if sky is not None
                                    else np.zeros((h, w), np.float32)),
                    frame_id=jnp.int32(fid))
                slot = self.campool.add_keyframe(
                    cam, T[:3, 3], fid,
                    T_c_l=np.asarray(cd["T_c_l"], np.float64))
                if slot is not None:
                    self._reset_cam_slot(slot)

        gs_iters = cfg.gs_iters + self._adaptive_offset(fid)
        if self.stop_status:
            gs_iters = max(1, gs_iters - 10)
        if gs_iters <= 0:
            return
        rep.metrics["gs_iters"] = gs_iters
        # build steps + params once, then iterate
        met = None
        local_idx = jnp.nonzero(self.m.local_mask, size=self._local_size,
                                fill_value=self.m.capacity)[0]
        # per-frame tile-table cache: the local point set changed with
        # the map update, so bins from last frame are invalid; within
        # this frame's iterations, bins are reused per (slot, level) and
        # re-built every raster_rebin_every uses or when projected means
        # drift past the pixel guard (VERDICT r3: amortized binning)
        bins_cache: Dict = {}

        # frozen surrounding-Gaussian background: once the decoders are
        # frozen, spawn Gaussians for the annulus outside the local map
        # once per frame and render them as a non-optimizable backdrop
        # (reference mapper.py:1039-1052, neural_gaussians.py:436-479).
        # Pre-freeze the SAME pytree is passed with every gaussian
        # invalid: surrounding=None used to flip the gs-step's trace at
        # the freeze frame, and that mid-run recompile was r4's largest
        # single-frame stall (1386 s decoded from the time table —
        # VERDICT r4 item 5). One trace now covers both phases.
        surrounding = None
        if self._sur_mask is not None:
            from pings_tpu.models.spawn import (
                gather_local_data, spawn_kwargs_from_cfg, spawn_gaussians)
            frozen = fid >= cfg.freeze_after_frame
            sur_local = gather_local_data(self.m, self._sur_mask,
                                          cfg.max_surrounding_points)
            sur = spawn_gaussians(
                sur_local, self.decoders,
                jnp.asarray(T[:3, 3], jnp.float32),
                jnp.full(cfg.max_surrounding_points, frozen, bool),
                **spawn_kwargs_from_cfg(cfg))
            surrounding = jax.tree.map(jax.lax.stop_gradient, sur)

        # coarse-to-fine: short-term keyframes train at the configured
        # pyramid level, long-term pool one level coarser with the depth
        # term re-weighted 4x per extra level (reference
        # cameras.py:86-186 pyramid + mapper.py:1061-1104, 1268)
        base_level = max(int(self.cfg.train_img_downrate).bit_length() - 1,
                         0)
        mets_pending = []
        dw_const = {1.0: jnp.float32(1.0), 4.0: jnp.float32(4.0)}
        slot_const = {}
        # one key split for the whole loop; per-iteration batches are
        # drawn inside the jitted step (draw_batch) — a GS iteration is
        # one dispatch over the TPU tunnel, not three
        bkeys = jax.random.split(self._next_key(), gs_iters)
        # pre-sample the frame's camera sequence and GROUP same-keyframe
        # iterations consecutively (stable in first-appearance order):
        # the same multiset of cameras trains, but the per-(slot, level)
        # tile-table cache now re-bins once per keyframe per frame
        # instead of on nearly every random slot switch (measured: a
        # cached iteration is 41 ms vs 56 ms with a fresh bin at replica
        # scale — scripts/diag/gs_iter_profile.py)
        plan = []
        for _ in range(gs_iters):
            pc = self.campool.sample()
            if pc is None:
                return
            plan.append(pc)
        order = {}
        for pc in plan:
            order.setdefault(pc.slot, []).append(pc)
        plan = [pc for group in order.values() for pc in group]
        short_term_iter = []
        for it in range(gs_iters):
            pc = plan[it]
            level = base_level
            depth_w = 1.0
            if cfg.long_term_train_down and pc in self.campool.long:
                level += 1
                depth_w = 4.0
            short_term_iter.append(level == base_level)
            cam = pc.level(level)   # cached pyramid (no per-iter device ops)
            h, w = cam.rgb.shape[:2]
            gstep = self._ensure_gs(w, h)
            if it == 0:
                self._sync_params_from_map()
            opt, params, state, steps = self._gs
            ckey = (pc.slot, level)
            ent = bins_cache.get(ckey)
            use_bins = (ent is not None
                        and ent["uses"] < cfg.raster_rebin_every)
            params, state, met, (bins_out, means2d, contrib) = gstep(
                params, state, self.m, self.decoders, local_idx,
                cam,
                slot_const.setdefault(pc.slot, jnp.int32(pc.slot)),
                (self.pool, bkeys[it]), freeze,
                surrounding=surrounding, depth_w=dw_const[depth_w],
                bins=ent["bins"] if use_bins else None,
                bin_means=ent["means"] if use_bins else None,
                cached_contrib=ent["contrib"] if use_bins else None,
                use_bins=use_bins, draw_batch=True)
            self._gs[1], self._gs[2] = params, state
            # no host syncs on the critical path: the drift-triggered
            # rebin happens inside the jit (lax.cond); the cache entry is
            # refreshed from the step's (possibly re-binned) output, and
            # nonfinite counting is deferred to frame end
            if use_bins:
                ent["uses"] += 1
                ent["bins"], ent["means"] = bins_out, means2d
            elif bins_out is not None:
                bins_cache[ckey] = {"bins": bins_out, "means": means2d,
                                    "contrib": contrib, "uses": 1}
            mets_pending.append(met)
        # one host sync for the loop's failure counter (not 1 per iter)
        n_nonfinite = int(jax.device_get(
            sum(m.nonfinite for m in mets_pending))) if mets_pending else 0
        if met is not None:
            self._apply_gs_params()
            # online PSNR = mean over this frame's SHORT-TERM base-level
            # iterations (long-term pool views train one pyramid level
            # coarser on old keyframes whose local map may since have
            # drifted/deformed — a last-iteration sample of those
            # reported drift, not current mapping quality; r4's kitti
            # "12.2" was exactly that artifact). Falls back to the last
            # iteration if the whole frame trained long-term views.
            st = [m for m, s in zip(mets_pending, short_term_iter) if s]
            psnr_v, l1_v = ((sum(m.psnr for m in st) / len(st),
                             sum(m.rgb_l1 for m in st) / len(st))
                            if st else (met.psnr, met.rgb_l1))
            rep.metrics["gs_psnr"] = float(psnr_v)
            rep.metrics["gs_l1"] = float(l1_v)
            rep.metrics["sdf_bce"] = float(met.sdf_bce)
            if n_nonfinite:
                # skipped updates (non-finite gradients) — surfaced like
                # the reference's tracking-health warnings
                rep.metrics["gs_nonfinite_steps"] = n_nonfinite

        # Gaussian invalidation: stable local points stranded off the SDF
        # zero level set stop spawning (reference
        # check_invalid_neural_points, mapper.py:1636-1655; pings.py:350)
        if cfg.gs_invalid_check_on and met is not None and fid > 0:
            self.m = field.check_invalid_gs(
                self.m, self.decoders, local_idx,
                cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m,
                jnp.float32(1.0),
                jnp.float32(cfg.dynamic_sdf_ratio_thre * cfg.voxel_size_m),
                k=cfg.query_nn_k, stencil_r=cfg.num_nei_cells,
                search_alpha=cfg.search_alpha, min_nn=cfg.query_nn_k)

    # -- visualization --------------------------------------------------------
    def make_vis_packet(self, pre: Optional[PreprocessedFrame] = None,
                        gt_poses=None, max_points: int = 200_000,
                        with_render: bool = False):
        """Snapshot current SLAM state as a VisPacket (the headless
        counterpart of the reference's per-frame VisPacket feed to the
        GUI process, pings.py:399-471)."""
        from pings_tpu.vis.packet import VisPacket, downsample_points

        pkt = VisPacket(frame_id=self.frame_id)
        n = int(self.m.count)
        if n:
            xyz = np.asarray(self.m.positions[:n])
            col = (np.clip(np.asarray(self.m.rgb[:n]), 0, 1)
                   * 255).astype(np.uint8)
            pkt.neural_points, pkt.neural_colors = downsample_points(
                xyz, col, max_points)
        if pre is not None and self.poses:
            T = self.poses[-1]
            pts_w = (pre.points_l[pre.mask] @ T[:3, :3].T
                     + T[:3, 3]).astype(np.float32)
            pkt.scan_points, _ = downsample_points(pts_w, None,
                                                   max_points // 4)
        if self.poses:
            pkt.traj_est = np.stack(
                [p[:3, 3] for p in self.poses]).astype(np.float32)
        if gt_poses is not None and len(gt_poses):
            pkt.traj_gt = np.stack(
                [p[:3, 3] for p in gt_poses[:len(self.poses)]]).astype(
                np.float32)
        if self.campool is not None:
            cams = self.campool.all_cams()[-12:]
            if cams:
                Ts, ks = [], []
                for pc in cams:
                    T_c_w = np.asarray(pc.cam.T_c_w, np.float64)
                    Ts.append(hp.se3_inv(T_c_w))
                    K = np.asarray(pc.cam.K)
                    h, w = pc.cam.rgb.shape[:2]
                    ks.append([float(K[0, 0]), float(K[1, 1]), w, h])
                pkt.cam_poses = np.stack(Ts).astype(np.float32)
                pkt.cam_intrinsics = np.asarray(ks, np.float32)
        if with_render and self.campool is not None and self.campool.short:
            pc = self.campool.short[-1]
            try:
                out = self.render_cam(pc.cam)
                pkt.images["render_rgb"] = (
                    np.clip(np.asarray(out.rgb), 0, 1) * 255).astype(
                    np.uint8)
                d = np.asarray(out.depth)
                pkt.images["render_depth"] = (
                    np.clip(d / max(float(d.max()), 1e-6), 0, 1)[..., None]
                    * np.ones(3) * 255).astype(np.uint8)
                pkt.images["target_rgb"] = (
                    np.clip(np.asarray(pc.cam.rgb), 0, 1) * 255).astype(
                    np.uint8)
            except Exception:
                pass  # rendering is best-effort for vis
        return pkt

    def render_cam(self, cam: CamView):
        """Render the current map from a pooled camera (GUI/live-render
        path; reference slam_gui.py:1496-1506)."""
        from pings_tpu.models.renderer import render
        from pings_tpu.models.spawn import (
            LocalPointData, spawn_kwargs_from_cfg)

        cfg = self.cfg
        local_idx = jnp.nonzero(self.m.local_mask, size=self._local_size,
                                fill_value=self.m.capacity)[0]
        m = self.m
        local = LocalPointData(
            positions=m.positions[local_idx], quats=m.quats[local_idx],
            geo_feat=m.geo_feat[local_idx],
            color_feat=m.color_feat[local_idx], rgb=m.rgb[local_idx],
            valid=(local_idx < m.capacity) & m.valid_gs_mask[local_idx])
        h, w = cam.rgb.shape[:2]
        return render(local, self.decoders, cam, w, h,
                      bg=jnp.asarray(cfg.bg_color, jnp.float32),
                      spawn_kwargs=spawn_kwargs_from_cfg(cfg),
                      tile=cfg.tile_size, max_per_tile=cfg.max_gs_per_tile,
                      gs_type=cfg.gs_type, precision=cfg.raster_precision)

    # -- persistence ----------------------------------------------------------
    def save(self, path: str):
        """Checkpoint map + decoders (reference save_implicit_map,
        tools.py:469-491 -> pin_map.pth; here a .npz)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        flat = {}

        def put(prefix, tree):
            leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
            for kp, leaf in leaves:
                flat[prefix + jax.tree_util.keystr(kp)] = np.asarray(leaf)

        put("map", self.m)
        put("dec", self.decoders)
        np.savez_compressed(path, poses=np.stack(self.poses)
                            if self.poses else np.zeros((0, 4, 4)),
                            travel=np.asarray(self.travel), **flat)

    def load(self, path: str):
        data = np.load(path, allow_pickle=False)
        self.poses = [p for p in data["poses"]]
        self.travel = list(data["travel"])

        def fill(prefix, tree):
            leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
            new = [jnp.asarray(data[prefix + jax.tree_util.keystr(kp)])
                   for kp, _ in leaves]
            return jax.tree_util.tree_unflatten(treedef, new)

        self.m = fill("map", self.m)
        self.decoders = fill("dec", self.decoders)


def _transform_pool(pool, deltas: jnp.ndarray):
    """Re-pose replay-pool samples by their frame's PGO correction
    (reference transform_data_pool, mapper.py:774-778)."""
    ts = jnp.clip(pool.ts, 0, deltas.shape[0] - 1)
    D = deltas[ts]
    pts = jnp.einsum("nij,nj->ni", D[:, :3, :3], pool.points) + D[:, :3, 3]
    return pool.replace(points=pts)
