"""LiDAR odometry: point-to-SDF Gauss-Newton/LM registration.

Reference: utils/tracker.py — ``tracking()`` (:43-210) iterates up to
``reg_iter_n`` steps of ``registration_step`` (:353-604): query SDF value +
gradient + std at transformed source points, gate by gradient norm in
[min,max] and SDF std, weight residuals with Geman-McClure robust kernel +
gradient-anomaly down-weighting, then ``implicit_reg`` (:608-688) solves the
6x6 normal equations in float64 with LM damping and retracts via expmap;
degeneracy is detected from the translation-block eigenvalues.

TPU split: the whole GN/LM iteration — per-point query/weight/reduction,
the damped 6x6 solve, the expmap retraction, and the convergence state
machine — runs in ONE jitted ``lax.while_loop`` per frame (the reference
loops ~50 python iterations with a device sync each; over a TPU tunnel
each sync costs ms, so the loop is the dispatch bottleneck, not the
math). The 6x6 solve is done in f32 after symmetric Jacobi equilibration
(D^-1/2 H D^-1/2 has unit diagonal, so LM damping becomes +lambda*I and
the condition number drops to the correlation structure), which keeps
f32 well within the tracker's mm-scale tolerance; only the final f64
health checks (eigenvalue degeneracy, covariance) stay host-side on the
single returned H.

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
from pings_tpu.ops import transforms as tf


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


class LoopOut(NamedTuple):
    T: jnp.ndarray           # (4, 4) f32 final pose
    H: jnp.ndarray           # (6, 6) final normal equations (health checks)
    mean_res: jnp.ndarray    # () final weighted mean |residual|
    valid_count: jnp.ndarray
    total_count: jnp.ndarray
    iterations: jnp.ndarray  # () i32 executed GN iterations


def make_track_loop(cfg):
    """Whole-frame GN/LM registration as one jitted while_loop.

    Replicates the reference host loop's control flow exactly
    (utils/tracker.py:43-152): break *before* retracting when fewer than
    10 residuals survive gating; retract, then break on small update;
    break on divergence (mean_res > 2x best-so-far after iter 5).
    """
    reg_step = make_registration_step(cfg)
    lm = cfg.reg_lm_lambda
    term_rot = float(np.radians(cfg.reg_term_thre_deg))
    term_tr = cfg.reg_term_thre_m
    # max sane per-iteration update: the SDF registration basin is only
    # ~surface_sample_range wide, so a GN step that wants to translate the
    # sensor by the reference's lose-track bound (40 x that range,
    # slam_dataset.py:733-740) can only come from a near-singular Hessian
    # slipping past the damping — stop without retracting instead of
    # committing a wild pose that the health gates downstream may not catch
    max_step_tr = 40.0 * cfg.surface_sample_range_m
    max_step_rot = 1.0  # rad; >57 deg in ONE GN step is never registration

    @functools.partial(jax.jit, static_argnames=("max_iter",))
    def track_loop(m, decoders, src, msk, inten, T0, max_iter: int):
        eye6 = jnp.eye(6, dtype=jnp.float32)

        def cond(c):
            return (~c[0]) & (c[1] < max_iter)

        def body(c):
            _, it, T, last_res, _ = c
            stats = reg_step(m, decoders, src, msk, inten, T)
            few = stats.valid_count < 10
            # damped solve (H + lm*diag(H)) xi = g with symmetric Jacobi
            # equilibration: xi = y/d where (H/dd^T + lm I) y = g/d
            d = jnp.sqrt(jnp.maximum(jnp.diag(stats.H), 1e-9))
            Hs = stats.H / (d[:, None] * d[None, :])
            xi = jnp.linalg.solve(Hs + lm * eye6, stats.g / d) / d
            T_new = tf.se3_exp(xi) @ T
            small = ((jnp.linalg.norm(xi[3:]) < term_rot)
                     & (jnp.linalg.norm(xi[:3]) < term_tr))
            diverged = (stats.mean_res > 2.0 * last_res) & (it > 5)
            bad = (~jnp.isfinite(xi).all()
                   | (jnp.linalg.norm(xi[:3]) > max_step_tr)
                   | (jnp.linalg.norm(xi[3:]) > max_step_rot))
            stop = few | small | diverged | bad
            T_out = jnp.where(few | bad, T, T_new)
            return (stop, it + 1,
                    T_out, jnp.minimum(last_res, stats.mean_res), stats)

        init_stats = RegStats(
            jnp.zeros((6, 6), jnp.float32), jnp.zeros(6, jnp.float32),
            jnp.float32(jnp.inf), jnp.int32(0), jnp.int32(0))
        stop, it, T, _, stats = jax.lax.while_loop(
            cond, body,
            (jnp.bool_(False), jnp.int32(0),
             T0.astype(jnp.float32), jnp.float32(jnp.inf), init_stats))
        del stop
        return LoopOut(T, stats.H, stats.mean_res, stats.valid_count,
                       stats.total_count, it)

    return track_loop


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
        self._track_loop = make_track_loop(cfg)

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
        src = jnp.asarray(source, jnp.float32)
        msk = jnp.asarray(source_mask)
        if source_intensity is None:
            inten = jnp.full((source.shape[0],), -1.0, jnp.float32)
        else:
            inten = jnp.asarray(source_intensity, jnp.float32)
        max_iter = max_iter or cfg.reg_iter_n

        out = self._track_loop(m, decoders, src, msk, inten,
                               jnp.asarray(init_T_w_l, jnp.float32),
                               max_iter=int(max_iter))
        # single host sync for the whole frame
        out = jax.device_get(out)
        T = np.asarray(out.T, np.float64)
        # the loop composes ~50 f32 expmap retractions; re-orthonormalize
        # the rotation on host so the committed pose does not accumulate
        # orthonormality drift across thousands of frames
        U, _, Vt = np.linalg.svd(T[:3, :3])
        R = U @ Vt
        if np.linalg.det(R) > 0:
            T[:3, :3] = R
        H_np = np.asarray(out.H, np.float64)
        mean_res = float(out.mean_res)
        vc = int(out.valid_count)
        tc = max(int(out.total_count), 1)
        valid_ratio = vc / tc
        it = int(out.iterations)

        # health checks (tracker.py:153-207)
        valid = True
        degenerate = False
        cov = None
        # final-pose jump gate: even when every residual/ratio/eigenvalue
        # gate passes (registration against corrupted geometry can satisfy
        # them all), a solution that moved more than the reference's
        # single-frame lose-track bound away from the initial guess is
        # never a valid registration (slam_dataset.py:733-740)
        d_tr = float(np.linalg.norm(T[:3, 3] - init_T_w_l[:3, 3]))
        dR = init_T_w_l[:3, :3].T @ T[:3, :3]
        d_rot = float(np.degrees(np.arccos(
            np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0))))
        if (d_tr > 40.0 * cfg.surface_sample_range_m) or (d_rot > 60.0):
            valid = False
            degenerate = True
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
        return TrackResult(T, valid, mean_res, valid_ratio, it, cov,
                           degenerate)
