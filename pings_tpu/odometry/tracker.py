"""LiDAR odometry: point-to-SDF Gauss-Newton/LM registration.

Reference: utils/tracker.py — ``tracking()`` (:43-210) iterates up to
``reg_iter_n`` steps of ``registration_step`` (:353-604): query SDF value +
gradient + std at transformed source points, gate by gradient norm in
[min,max] and SDF std, weight residuals with Geman-McClure robust kernel +
gradient-anomaly down-weighting, then ``implicit_reg`` (:608-688) solves the
6x6 normal equations in float64 with LM damping and retracts via expmap;
degeneracy is detected from the translation-block eigenvalues.

TPU split: the per-point work (query, gradients, weights, J^T J / J^T r
reduction) is one fused jitted kernel returning a 6x6 + 6 + scalars; the
tiny f64 solve, pose composition, and the convergence / health state
machine stay on host (SURVEY.md §7.1: f64 pose math host-side).

Twist convention: xi = [rho(3), phi(3)], perturbation T <- exp(xi) T, so
J_row = [grad^T, (x ^ grad)^T] with x the transformed point.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pings_tpu.models import field
from pings_tpu.models import neural_points as npm
from pings_tpu.utils import pose as hp


class RegStats(NamedTuple):
    H: jnp.ndarray           # (6, 6)
    g: jnp.ndarray           # (6,)
    mean_res: jnp.ndarray    # () weighted mean |residual|
    valid_count: jnp.ndarray  # () i32
    total_count: jnp.ndarray  # () i32


def make_registration_step(cfg):
    sigma_scale = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
    k = cfg.query_nn_k
    stencil_r = cfg.num_nei_cells
    alpha = cfg.search_alpha
    gm_k = cfg.reg_gm_k
    min_gn = cfg.reg_min_grad_norm
    max_gn = cfg.reg_max_grad_norm
    max_std = cfg.max_sdf_std_ratio * cfg.voxel_size_m
    photometric = cfg.photometric_loss_on
    w_photo = cfg.photometric_loss_weight

    def _intensity(m, decoders, p):
        """Map intensity (mean RGB) at a single point — differentiable in
        p for the photometric Jacobian. Returns (value, (value, valid))."""
        c, v = field.color_at(m, decoders, p[None, :], k, stencil_r, alpha)
        i = jnp.mean(c[0])
        return i, (i, v[0])

    @jax.jit
    def reg_step(m: npm.NeuralPointMap, decoders, src: jnp.ndarray,
                 src_mask: jnp.ndarray, src_intensity: jnp.ndarray,
                 T: jnp.ndarray) -> RegStats:
        x = src @ T[:3, :3].T + T[:3, 3]                 # (S, 3)
        sdf, grad, std, valid = field.sdf_grad_analytical(
            m, decoders, x, sigma_scale, k, stencil_r, alpha)
        gn = jnp.linalg.norm(grad, axis=-1)
        ok = (
            src_mask & valid
            & (gn > min_gn) & (gn < max_gn)
            & (std < max_std)
        )
        # project the residual onto the *unit* gradient: distance-space
        # residual (tracker.py:394-430 divides by grad norm)
        gn_safe = jnp.maximum(gn, 1e-6)
        r = sdf / gn_safe
        ghat = grad / gn_safe[:, None]

        # Geman-McClure robust weight on residual + gradient-anomaly
        # down-weighting (tracker.py:431-517)
        w_gm = (gm_k / (gm_k + r * r)) ** 2
        w_anom = jnp.exp(-jnp.maximum(gn - 1.0, 0.0) ** 2
                         / (2.0 * 0.5 ** 2))
        w = jnp.where(ok, w_gm * w_anom, 0.0)

        J = jnp.concatenate([ghat, jnp.cross(x, ghat)], axis=-1)  # (S, 6)
        Jw = J * w[:, None]
        H = J.T @ Jw                                      # (6, 6)
        g = -(Jw.T @ r)                                   # (6,)

        if photometric:
            # color residual rows (reference implicit_color_reg,
            # tracker.py:692-737): intensity residual with the map's color
            # field gradient, same robust weights, added into the same
            # normal equations scaled by w_photo_loss
            cgrad, (cpred, cvalid) = jax.vmap(
                jax.grad(lambda p: _intensity(m, decoders, p),
                         has_aux=True))(x)
            has_meas = src_intensity >= 0.0       # -1 marks "no color"
            r_c = cpred - src_intensity
            w_c = jnp.where(ok & cvalid & has_meas, w, 0.0)
            J_c = jnp.concatenate([cgrad, jnp.cross(x, cgrad)], axis=-1)
            Jw_c = J_c * w_c[:, None]
            H = H + w_photo * (J_c.T @ Jw_c)
            g = g - w_photo * (Jw_c.T @ r_c)

        wsum = jnp.maximum(jnp.sum(w), 1e-9)
        mean_res = jnp.sum(jnp.abs(r) * w) / wsum
        return RegStats(H, g, mean_res,
                        jnp.sum(ok.astype(jnp.int32)),
                        jnp.sum(src_mask.astype(jnp.int32)))

    return reg_step


class TrackResult(NamedTuple):
    T_w_l: np.ndarray        # (4, 4) f64 pose estimate
    valid: bool
    mean_res: float
    valid_ratio: float
    iterations: int
    cov: Optional[np.ndarray]
    degenerate: bool


class Tracker:
    """Host-side GN/LM loop + health checks (reference Tracker)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self._reg_step = make_registration_step(cfg)

    def track(
        self,
        m: npm.NeuralPointMap,
        decoders,
        source: np.ndarray,            # (S, 3) sensor-frame points
        source_mask: np.ndarray,       # (S,)
        init_T_w_l: np.ndarray,        # (4, 4) f64 initial guess
        max_iter: Optional[int] = None,
        source_intensity: Optional[np.ndarray] = None,  # (S,) in [0,1];
        # -1 (or omitted) = no color measurement for that point
    ) -> TrackResult:
        cfg = self.cfg
        T = np.asarray(init_T_w_l, np.float64).copy()
        src = jnp.asarray(source, jnp.float32)
        msk = jnp.asarray(source_mask)
        if source_intensity is None:
            inten = jnp.full((source.shape[0],), -1.0, jnp.float32)
        else:
            inten = jnp.asarray(source_intensity, jnp.float32)
        term_rot = np.radians(cfg.reg_term_thre_deg)
        term_tr = cfg.reg_term_thre_m
        lm = cfg.reg_lm_lambda
        max_iter = max_iter or cfg.reg_iter_n

        last_res = np.inf
        valid_ratio = 0.0
        mean_res = np.inf
        H_np = None
        it = 0
        for it in range(max_iter):
            stats = self._reg_step(m, decoders, src, msk, inten,
                                   jnp.asarray(T, jnp.float32))
            H_np = np.asarray(stats.H, np.float64)
            g_np = np.asarray(stats.g, np.float64)
            mean_res = float(stats.mean_res)
            vc = int(stats.valid_count)
            tc = max(int(stats.total_count), 1)
            valid_ratio = vc / tc
            if vc < 10:
                break
            # LM damping scaled by the diagonal
            D = np.diag(np.maximum(np.diag(H_np), 1e-9))
            try:
                xi = np.linalg.solve(H_np + lm * D, g_np)
            except np.linalg.LinAlgError:
                break
            T = hp.se3_exp(xi) @ T
            if (np.linalg.norm(xi[3:]) < term_rot
                    and np.linalg.norm(xi[:3]) < term_tr):
                break
            # divergence guard (tracker.py:133-152)
            if mean_res > 2.0 * last_res and it > 5:
                break
            last_res = min(last_res, mean_res)

        # health checks (tracker.py:153-207)
        valid = True
        degenerate = False
        cov = None
        if valid_ratio < cfg.valid_ratio_thre:
            valid = False
        if mean_res * 100.0 > cfg.max_valid_final_sdf_residual_cm:
            valid = False
        # non-finite residual or pose is never valid (NaN comparisons are
        # all False, so the threshold checks above cannot catch them — a
        # NaN pose otherwise gets committed into the trajectory)
        if not np.isfinite(mean_res) or not np.isfinite(T).all():
            valid = False
            degenerate = True
        if H_np is not None and self.cfg.eigenvalue_check:
            # translation block eigenvalues (degeneracy along a direction);
            # a non-finite Hessian (all residuals rejected after losing
            # track) is degenerate by definition — guard it instead of
            # letting eigvalsh raise (reference health checks,
            # tracker.py:133-207)
            Ht = H_np[:3, :3]
            if not np.isfinite(Ht).all():
                degenerate = True
                valid = False
            else:
                evals = np.linalg.eigvalsh(Ht)
                if evals[0] < cfg.eigenvalue_ratio_thre * max(evals[-1],
                                                              1e-12):
                    degenerate = True
            try:
                cov = np.linalg.inv(H_np + 1e-9 * np.eye(6))
            except np.linalg.LinAlgError:
                cov = None
        return TrackResult(T, valid, mean_res, valid_ratio, it + 1, cov,
                           degenerate)
