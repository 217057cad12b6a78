"""Pallas TPU kernels for the alpha-blend stage of the rasterizer.

The portable XLA blend (ops/rasterize.blend_tiles) materializes large
(T, chunk, P) temporaries and its autodiff backward issues per-chunk
scatters. These kernels keep the whole tile state in VMEM and run the
blend as full-width (SUPER, P) vector/matrix ops:

- per-gaussian scalars (mean, conic, opacity) live on the sublane axis,
  pixels on the lane axis, so broadcasts need no transposes;
- the prefix products/sums over blend order run on the MXU as one
  triangular (SUPER, SUPER) @ (SUPER, P) matmul — the product in log
  space (exp(tril_strict @ log(1-a))), the sum directly;
- channel accumulation and the backward's per-slot direct gradients are
  single MXU matmuls per superblock ((16,K)@(K,P) and (K,P)@(P,16));
- superblocks past the tile's occupancy (bins.counts) or past alpha
  saturation (transmittance < TRANS_EPS) are skipped;
- the backward is a single front-to-back pass using the suffix identity
  (see _bwd kernels), so fwd+bwd costs about two forwards.

The per-pixel quadratic q is evaluated in the direct (px - mu) form: a
round-3 experiment moved it to a per-slot coefficient table contracted
against a pixel-basis matmul — the kernels were exactly as fast (the
column extractions the rework targeted were never the bottleneck), and
the XLA-side coefficient table cost ~25 ms/iter in minor-dim slice/stack
relayouts, so the direct form stays.

Dataflow (one custom_vjp over the whole pack+blend stage):
- forward: XLA gathers the per-tile packed attribute table (T, Kmax, 16)
  from the per-gaussian attribute matrix (N, 16) via bins.gauss_idx, then
  the Pallas kernel maps it to (T, 8, P) blended channels + (T, 1, P)
  final transmittance (+ (T, 1, P) median depth in surfel mode). Only
  the 8 meaningful output rows are emitted (r5: emitting all 16 table
  columns doubled kernel-output HBM traffic and untile cost for rows
  that blended geometry columns into garbage).
- backward: the Pallas kernel re-blends front-to-back emitting per-slot
  gradients (T, Kmax, 16); one XLA scatter-add onto bins.gauss_tbl
  aggregates them per gaussian (~10 ms at 460k slots on v5e; sorted-
  scatter, segment-sum, shift-combine and hierarchical MXU-cumsum
  variants all measured equal or worse — TPU row-indexed ops cost
  ~20 ns/row regardless of index pattern). rho = sum_c g_c out_c comes
  free from the saved forward outputs.
Background compositing and depth normalization stay in XLA (autodiffed).

Binning reuse: ``rasterize_pallas(..., bins=...)`` skips re-binning —
during GS training the spawned gaussians move slowly (bounded MLP
displacements), so the mapper re-bins every few iterations per keyframe
and reuses the table in between (a max-|Δmeans2d| drift guard triggers
early rebinds; binning is non-differentiable structure in both paths).

Attribute channel layouts (lane dim, 16 columns) — chosen so the packed
block doubles as the output-attribute matrix:

3DGS (gauss_attr_matrix; columns 0-7 are exactly the blended output
channels): 0 r, 1 g, 2 b, 3 depth, 4 nx, 5 ny, 6 nz, 7 const 1.0 (alpha
channel), 8 mu_x, 9 mu_y, 10 conic_a, 11 conic_b, 12 conic_c,
13 opacity (0 = masked), 14-15 pad. Output rows: 0 r, 1 g, 2 b, 3 depth,
4 nx, 5 ny, 6 nz, 7 alpha (the rho identity holds: cotangents exist only
for these 8 emitted rows).

Surfel (surfel_attr_matrix; the reference default gs_type,
diff-gaussian-surfel-rasterization-w-pose, call
gaussian_renderer/__init__.py:313-347): 0 r, 1 g, 2 b, 3-5 blend normal,
6 mu_x, 7 mu_y, 8 conic_a, 9 conic_b, 10 conic_c, 11 opacity,
12 ndx, 13 ndy, 14 nd0, 15 pad — [ndx, ndy, nd0] are the per-gaussian
*global-pixel-basis* plane-depth coefficients
    s(px, py) = ndx px + ndy py + nd0 = (n . d_pix) / plane_d,
    z = 1 / s
(ndx = n_x/(fx pd) etc.; unlike q, s has no catastrophic cancellation at
global pixel coordinates — all terms are O(1/z) — so no per-tile
localization is needed and the whole attribute matrix stays per-gaussian).
Per-pixel depth and alpha accumulate as per-superblock row sums (no
constant-1 column needed), median depth (transmittance-0.5 crossing) is
a forward-only extra output. Output rows: 0 r, 1 g, 2 b, 3-5 normal,
6 depth, 7 alpha, 8-15 zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pings_tpu.ops.rasterize import (
    ProjectedGaussians, ProjectedSurfels, RenderOutput, TileBins,
    apply_pose_delta, bin_gaussians, project_gaussians, project_surfels,
)

INTERPRET = False  # set True to run the kernels in interpreter mode (CPU)
SUPER = 256        # gaussians blended per superblock (sublane axis)
NCH = 16           # packed channel columns (attr table lanes)
NOUT = 8           # blended output rows (cols 0-7 of the table; the
                   # geometry columns 8-15 blend to nothing meaningful,
                   # so emitting them only doubled the kernel-output HBM
                   # traffic and the untile cost — r5 slimming)
CUTOFF_Q = 9.0
ALPHA_FLOOR = 1.0 / 255.0
TRANS_EPS = 1e-4   # early-termination threshold


def gauss_attr_matrix(p: ProjectedGaussians) -> jnp.ndarray:
    """Per-gaussian packed attribute matrix (N, 16) — differentiable."""
    opa = jnp.where(p.valid, p.opacity, 0.0)
    z = jnp.zeros_like(opa)
    cols = [
        p.color[..., 0], p.color[..., 1], p.color[..., 2],
        p.depth,
        p.normal[..., 0], p.normal[..., 1], p.normal[..., 2],
        jnp.ones_like(opa),
        p.means2d[..., 0], p.means2d[..., 1],
        p.conic[..., 0], p.conic[..., 1], p.conic[..., 2],
        opa,
        z, z,
    ]
    return jnp.stack(cols, axis=1)          # (N, 16)


def surfel_attr_matrix(ps: ProjectedSurfels, K: jnp.ndarray) -> jnp.ndarray:
    """Per-surfel packed attribute matrix (N, 16) — differentiable.

    Builds the global plane-depth basis coefficients from the tangent
    plane (module docstring): s = ndx px + ndy py + nd0 = (n.d_pix)/pd."""
    b = ps.base
    opa = jnp.where(b.valid, b.opacity, 0.0)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    # plane_d <= 0 by construction (normal flipped toward camera,
    # rasterize.project_surfels); guard the through-camera plane
    pd = jnp.minimum(ps.plane_d, -1e-9)
    ndx = ps.plane_n[..., 0] / (fx * pd)
    ndy = ps.plane_n[..., 1] / (fy * pd)
    nd0 = (ps.plane_n[..., 2] - ps.plane_n[..., 0] * cx / fx
           - ps.plane_n[..., 1] * cy / fy) / pd
    cols = [
        b.color[..., 0], b.color[..., 1], b.color[..., 2],
        b.normal[..., 0], b.normal[..., 1], b.normal[..., 2],
        b.means2d[..., 0], b.means2d[..., 1],
        b.conic[..., 0], b.conic[..., 1], b.conic[..., 2],
        opa,
        ndx, ndy, nd0,
        jnp.zeros_like(opa),
    ]
    return jnp.stack(cols, axis=1)          # (N, 16)


# per-mode column indices: (mu_x, mu_y, conic_a, conic_b, conic_c, opa)
_GEOM_COLS = {"3dgs": (8, 9, 10, 11, 12, 13),
              "surfel": (6, 7, 8, 9, 10, 11)}
_ND_COLS = (12, 13, 14)    # surfel plane-depth basis columns


def _pack_table(attr16: jnp.ndarray, bins: TileBins) -> jnp.ndarray:
    """Gather (N, 16) -> (T, Kmax, 16): ONE per-slot row gather straight
    off the gaussian-id table, nothing else. Slots past a tile's count
    hold neighboring tiles' real rows (rasterize._build_window_table);
    they are neutralized *inside* the kernels by the per-slot count mask
    (_slot_mask) — a 2-op VPU compare — instead of a full (T, Kmax, 16)
    where-pass here, which cost ~2-3 ms/iter of pure HBM traffic (r5)."""
    n = attr16.shape[0]
    return attr16[jnp.minimum(bins.gauss_tbl, n - 1)]     # (T, Kmax, 16)


def _slot_mask(k0, sb: int, cnt):
    """(sb, 1) bool: slot k0+i is within the tile's occupancy count."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (sb, 1), 0)
    return (k0 + iota) < cnt


def _unpack_grads(dtable: jnp.ndarray, bins: TileBins,
                  n: int) -> jnp.ndarray:
    """Aggregate per-slot grads (T, Kmax, 16) -> (N, 16) by scatter-add
    on the gaussian-id table.

    Masked slots carry exactly-zero gradients (the kernels' _slot_mask
    forces their alpha to 0 and the active gate kills every term), so no
    mask filter is needed before the add."""
    flat = dtable.reshape(-1, NCH)
    idx = jnp.minimum(bins.gauss_tbl.reshape(-1), n - 1)
    return jnp.zeros((n, NCH), dtable.dtype).at[idx].add(flat)


def _pixel_grid(t, ntx: int, tile: int):
    """Pixel-center coordinates of tile t as two (1, P) rows."""
    P = tile * tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    tx = (t % ntx) * tile
    ty = (t // ntx) * tile
    px = (tx + lane % tile).astype(jnp.float32) + 0.5
    py = (ty + lane // tile).astype(jnp.float32) + 0.5
    return px, py


def _tri(strict: bool, sb: int) -> jnp.ndarray:
    """(sb, sb) lower-triangular ones: left-multiplied onto an (sb, P)
    block it yields per-row sums over slots j < i (strict) or j <= i
    (inclusive) — prefix scans as one MXU matmul. Emitted in bf16:
    0/1 are exact, so the split dots below lose nothing."""
    r = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 1)
    return ((r > c) if strict else (r >= c)).astype(jnp.bfloat16)


def _superblock(kmax: int, sup: int = SUPER) -> int:
    """Largest power-of-two block <= sup dividing kmax."""
    sb = min(sup, kmax)
    while kmax % sb:
        sb //= 2
    assert sb >= 8, f"max_per_tile={kmax} must be divisible by a block >= 8"
    return sb


def _bf16_split(x):
    """x (f32) -> (hi, lo) bf16 with hi + lo ≈ x to ~2^-17 relative.

    Mosaic supports only DEFAULT (one-pass bf16) and HIGHEST (six-pass)
    dot precision in kernels; a manual two/three-pass split hits ~f32
    accuracy at a third of HIGHEST's MXU passes."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _tri_matmul(tri, x, fast: bool = False):
    """tri (bf16-exact) @ x via two one-pass bf16 dots (f32 accumulate);
    fast = one single-pass bf16 dot (~2^-8 relative error). Precision is
    pinned to DEFAULT: the operands are deliberately bf16, and inheriting
    a global f32 default (pings_tpu/__init__.py) would make Mosaic reject
    the kernel (fp32 contract precision on bf16 vectors)."""
    d = lambda u: jax.lax.dot_general(
        tri, u, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    if fast:
        return d(x.astype(jnp.bfloat16))
    xh, xl = _bf16_split(x)
    return d(xh) + d(xl)


def _split_dot(a, b, dims, fast: bool = False):
    """a @ b with both operands bf16-split: three one-pass bf16 dots
    (hh + hl + lh; the ll term is below 2^-18 relative). fast = one
    single-pass bf16 dot."""
    d = lambda u, v: jax.lax.dot_general(
        u, v, (dims, ((), ())), precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    if fast:
        return d(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _excl_prod_logmm(one_m, tri_s, fast: bool = False):
    """Exclusive prefix product along sublanes via one triangular MXU
    matmul in log space. one_m in [1e-3, 1] (alpha clamps at 0.999)
    keeps the log bounded; where transmittance is non-negligible the
    summed log is O(10), so the exp round-trip error is ~1e-6 relative.

    Superseded by the shift-multiply scan below (r5): the log+exp pair
    costs ~1 VPU transcendental per slot-pixel on both ends, measured
    2.76 vs 2.01 ms for the fwd kernel at (3600, 128, 256)
    (scripts/diag/kernel_formulation_probe.py). Kept for the probe."""
    return jnp.exp(_tri_matmul(tri_s, jnp.log(one_m), fast))


def _excl_prod(one_m, tri_s, fast: bool = False):
    """Exclusive prefix product along sublanes: Hillis-Steele scan of
    log2(sb) shifted f32 multiplies. Exact (no log/exp round-trip, no
    bf16 matmul error — the 'fast' blend's dominant drift source) and
    ~27% faster than the log-space MXU matmul it replaces. ``tri_s`` is
    unused (kept for signature parity with _excl_prod_logmm)."""
    del tri_s, fast
    sb, P = one_m.shape
    x = one_m
    sh = 1
    while sh < sb:
        pad = jnp.ones((sh, P), one_m.dtype)
        x = x * jnp.concatenate([pad, x[:sb - sh]], axis=0)
        sh *= 2
    return jnp.concatenate([jnp.ones((1, P), one_m.dtype),
                            x[:sb - 1]], axis=0)


def _super_alpha(chunk, px, py, mode: str):
    """chunk (SUPER, 16) -> (alpha, dx, dy, q, unclamped), each
    (SUPER, P). Column layout per module docstring."""
    mx, my, ca, cb, cc, op = _GEOM_COLS[mode]
    col = lambda c: chunk[:, c:c + 1]                 # (SUPER, 1)
    dx = px - col(mx)
    dy = py - col(my)
    q = col(ca) * dx * dx + col(cc) * dy * dy + 2.0 * col(cb) * dx * dy
    araw = col(op) * jnp.exp(-0.5 * q)
    araw = jnp.where((q < CUTOFF_Q) & (araw >= ALPHA_FLOOR), araw, 0.0)
    alpha = jnp.minimum(araw, 0.999)
    return alpha, dx, dy, q, araw < 0.999


def _surfel_z(chunk, px, py):
    """Per-pixel plane depth z = 1 / (ndx px + ndy py + nd0); z_ok gates
    z > 0.01 (the XLA arbiter's gate with its sign guard)."""
    c = lambda i: chunk[:, i:i + 1]
    ndx, ndy, nd0 = _ND_COLS
    s = c(ndx) * px + c(ndy) * py + c(nd0)
    z_ok = (s > 1e-6) & (s < 100.0)
    z = jnp.where(z_ok, 1.0 / jnp.where(z_ok, s, 1.0), 0.0)
    return s, z, z_ok


def _lane_onehot(c: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NCH), 1)
    return (lane == c).astype(jnp.float32)


def _grid_tiles(T: int) -> int:
    """Tiles per grid step: largest power of two <= 16 dividing T (each
    grid step costs ~2 us of fixed pipeline overhead on v5e)."""
    for g in (16, 8, 4, 2):
        if T % g == 0:
            return g
    return 1


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------

def _fwd_kernel_3dgs(tile0_ref, counts_ref, attrs_ref, out_ref, trans_ref,
                     *, ntx: int, tile: int, kmax: int, sup: int,
                     gtiles: int, fast: bool):
    """Blend ``gtiles`` tiles per grid step (batched to amortize the
    fixed ~2 us/step pipeline overhead).

    ``tile0_ref`` (SMEM (1,)): global index of this shard's first tile —
    0 single-chip; under tile-sharding (shard_map over the tile axis,
    parallel/mesh.py) the local tile t sits at global pixel position
    t + tile0."""
    P = tile * tile
    sb = _superblock(kmax, sup)
    tri_s = _tri(True, sb)

    for g in range(gtiles):
        t = pl.program_id(0) * gtiles + g
        px, py = _pixel_grid(t + tile0_ref[0], ntx, tile)
        cnt = counts_ref[t]

        def super_body(j, carry, px=px, py=py, cnt=cnt, g=g):
            acc, trans = carry
            k0 = pl.multiple_of(j * sb, sb)

            def compute(_):
                chunk = attrs_ref[g, pl.ds(k0, sb), :]      # (sb, 16)
                alpha, _, _, _, _ = _super_alpha(chunk, px, py, "3dgs")
                alpha = jnp.where(_slot_mask(k0, sb, cnt), alpha, 0.0)
                one_m = 1.0 - alpha
                excl = _excl_prod(one_m, tri_s, fast)       # (sb, P)
                w = alpha * excl * trans                    # blend weights
                # acc (8, P) += chunk[:, :8]^T @ w on the MXU
                acc2 = acc + _split_dot(chunk[:, :NOUT], w, ((0,), (0,)),
                                        fast)
                trans2 = trans * (excl[sb - 1:sb, :]
                                  * one_m[sb - 1:sb, :])
                return acc2, trans2

            live = (jnp.max(trans) > TRANS_EPS) & (j * sb < cnt)
            return jax.lax.cond(live, compute, lambda _: carry, None)

        acc0 = jnp.zeros((NOUT, P), jnp.float32)
        trans0 = jnp.ones((1, P), jnp.float32)
        acc, trans = jax.lax.fori_loop(0, kmax // sb, super_body,
                                       (acc0, trans0))
        out_ref[g] = acc
        trans_ref[g] = trans


def _fwd_kernel_surfel(tile0_ref, counts_ref, attrs_ref, out_ref,
                       trans_ref, med_ref,
                       *, ntx: int, tile: int, kmax: int, sup: int,
                       gtiles: int, fast: bool):
    P = tile * tile
    sb = _superblock(kmax, sup)
    tri_s = _tri(True, sb)
    row = jax.lax.broadcasted_iota(jnp.int32, (NOUT, 1), 0)
    lt6 = (row < 6).astype(jnp.float32)
    oh6 = (row == 6).astype(jnp.float32)
    oh7 = (row == 7).astype(jnp.float32)

    for g in range(gtiles):
        t = pl.program_id(0) * gtiles + g
        px, py = _pixel_grid(t + tile0_ref[0], ntx, tile)
        cnt = counts_ref[t]

        def super_body(j, carry, px=px, py=py, cnt=cnt, g=g):
            def compute(c):
                acc, acc_d, acc_a, trans, med, med_set = c
                k0 = pl.multiple_of(j * sb, sb)
                chunk = attrs_ref[g, pl.ds(k0, sb), :]
                _, z, z_ok = _surfel_z(chunk, px, py)
                alpha, _, _, _, _ = _super_alpha(chunk, px, py, "surfel")
                alpha = jnp.where(z_ok & _slot_mask(k0, sb, cnt),
                                  alpha, 0.0)
                one_m = 1.0 - alpha
                excl = _excl_prod(one_m, tri_s, fast)
                T_in = excl * trans
                w = alpha * T_in
                acc2 = acc + _split_dot(chunk[:, :NOUT], w, ((0,), (0,)),
                                        fast)
                acc_d2 = acc_d + jnp.sum(w * z, axis=0, keepdims=True)
                acc_a2 = acc_a + jnp.sum(w, axis=0, keepdims=True)
                # median depth: the slot where transmittance crosses 0.5
                T_out = T_in * one_m
                crossing = (T_in > 0.5) & (T_out <= 0.5)
                med_c = jnp.sum(jnp.where(crossing, z, 0.0), axis=0,
                                keepdims=True)
                has = jnp.max(crossing.astype(jnp.float32), axis=0,
                              keepdims=True)
                med2 = jnp.where((med_set < 0.5) & (has > 0.5), med_c, med)
                trans2 = trans * (excl[sb - 1:sb, :] * one_m[sb - 1:sb, :])
                return (acc2, acc_d2, acc_a2, trans2, med2,
                        jnp.maximum(med_set, has))

            live = (jnp.max(carry[3]) > TRANS_EPS) & (j * sb < cnt)
            return jax.lax.cond(live, compute, lambda c: c, carry)

        z1 = jnp.zeros((1, P), jnp.float32)
        acc, acc_d, acc_a, trans, med, _ = jax.lax.fori_loop(
            0, kmax // sb, super_body,
            (jnp.zeros((NOUT, P), jnp.float32), z1, z1,
             jnp.ones((1, P), jnp.float32), z1, z1))
        out_ref[g] = acc * lt6 + oh6 * acc_d + oh7 * acc_a
        trans_ref[g] = trans
        med_ref[g] = med


# ---------------------------------------------------------------------------
# Backward kernels (single front-to-back pass, suffix identity)
# ---------------------------------------------------------------------------
# dL/da_i(p) = T_i phi_i - (rho - sigma_i)/(1 - a_i)
#              - g_trans trans_final/(1 - a_i)
# where phi_i = sum_c g_c attr_c_i (+ per-pixel depth/alpha terms in
# surfel mode), rho = sum_c g_c O_c (computed in XLA from the saved
# forward outputs), sigma_i = running sum of w_j phi_j (j <= i),
# trans_final = saved forward transmittance.

def _geom_grads(chunk, g_or_gp, w, dq, dx, dy, dexp, mode: str, fast):
    """Direct channel grads (sb, 16): one MXU matmul for the blended
    attribute columns (0..7, padded right to 16 lanes) + one-hot outer
    products for the geometry columns.
    q = A dx^2 + C dy^2 + 2B dx dy, dx = px - mu_x:
    dq/dmu_x = -(2A dx + 2B dy), dq/dmu_y = -(2C dy + 2B dx)."""
    mx, my, ca, cb, cc, op = _GEOM_COLS[mode]
    col = lambda c: chunk[:, c:c + 1]
    red = lambda x: jnp.sum(x, axis=1, keepdims=True)     # (sb, 1)
    dopa = red(dexp)
    dA = red(dq * dx * dx)
    dB = red(2.0 * dq * dx * dy)
    dC = red(dq * dy * dy)
    dmux = red(dq * (-2.0 * col(ca) * dx - 2.0 * col(cb) * dy))
    dmuy = red(dq * (-2.0 * col(cc) * dy - 2.0 * col(cb) * dx))
    d8 = _split_dot(w, g_or_gp, ((1,), (1,)), fast)       # (sb, NOUT)
    d_chunk = jnp.concatenate(
        [d8, jnp.zeros((d8.shape[0], NCH - NOUT), d8.dtype)], axis=1)
    return (d_chunk
            + dmux * _lane_onehot(mx) + dmuy * _lane_onehot(my)
            + dA * _lane_onehot(ca) + dB * _lane_onehot(cb)
            + dC * _lane_onehot(cc) + dopa * _lane_onehot(op))


def _bwd_kernel_3dgs(tile0_ref, counts_ref, attrs_ref, gout_ref,
                     gtrans_ref, rho_ref,
                     transf_ref, dattrs_ref, *, ntx: int, tile: int,
                     kmax: int, sup: int, gtiles: int, fast: bool):
    P = tile * tile
    sb = _superblock(kmax, sup)
    tri_s = _tri(True, sb)
    tri_i = _tri(False, sb)

    for gi_ in range(gtiles):
        t = pl.program_id(0) * gtiles + gi_
        px, py = _pixel_grid(t + tile0_ref[0], ntx, tile)
        cnt = counts_ref[t]
        g = gout_ref[gi_]                       # (16, P)
        g_trans = gtrans_ref[gi_]               # (1, P)
        rho = rho_ref[gi_]                      # (1, P)
        trans_final = transf_ref[gi_]           # (1, P)

        def super_body(j, carry, px=px, py=py, cnt=cnt, gi_=gi_, g=g,
                       g_trans=g_trans, rho=rho, trans_final=trans_final):
            k0 = pl.multiple_of(j * sb, sb)

            def compute(c):
                sigma, trans = c
                chunk = attrs_ref[gi_, pl.ds(k0, sb), :]     # (sb, 16)
                alpha, dx, dy, q, unclamped = _super_alpha(
                    chunk, px, py, "3dgs")
                alpha = jnp.where(_slot_mask(k0, sb, cnt), alpha, 0.0)
                one_m = 1.0 - alpha
                one_m_safe = jnp.maximum(one_m, 1e-3)
                excl = _excl_prod(one_m, tri_s, fast)
                T_i = excl * trans                           # (sb, P)
                w = alpha * T_i
                # phi (sb, P) = chunk[:, :8] @ g on the MXU
                phi = _split_dot(chunk[:, :NOUT], g, ((1,), (0,)), fast)
                sigma_i = sigma + _tri_matmul(tri_i, w * phi, fast)
                da = (phi * T_i - (rho - sigma_i) / one_m_safe
                      - g_trans * trans_final / one_m_safe)
                active = alpha > 0.0
                da = jnp.where(active, da, 0.0)
                # alpha = min(opa*exp(-.5q), 0.999): zero grad if clamped
                dq = jnp.where(unclamped, -0.5 * alpha * da, 0.0)
                dexp = jnp.where(active & unclamped,
                                 jnp.exp(-0.5 * q) * da, 0.0)
                d_chunk = _geom_grads(chunk, g, w, dq, dx, dy, dexp,
                                      "3dgs", fast)
                dattrs_ref[gi_, pl.ds(k0, sb), :] = d_chunk
                return (sigma_i[sb - 1:sb, :],
                        trans * (excl[sb - 1:sb, :] * one_m[sb - 1:sb, :]))

            def skip(c):
                dattrs_ref[gi_, pl.ds(k0, sb), :] = jnp.zeros(
                    (sb, NCH), jnp.float32)
                return c

            live = (jnp.max(carry[1]) > TRANS_EPS) & (j * sb < cnt)
            return jax.lax.cond(live, compute, skip, carry)

        jax.lax.fori_loop(0, kmax // sb, super_body,
                          (jnp.zeros((1, P), jnp.float32),
                           jnp.ones((1, P), jnp.float32)))


def _bwd_kernel_surfel(tile0_ref, counts_ref, attrs_ref, gout_ref,
                       gtrans_ref, rho_ref, transf_ref, dattrs_ref, *,
                       ntx: int,
                       tile: int, kmax: int, sup: int, gtiles: int,
                       fast: bool):
    P = tile * tile
    sb = _superblock(kmax, sup)
    tri_s = _tri(True, sb)
    tri_i = _tri(False, sb)
    row = jax.lax.broadcasted_iota(jnp.int32, (NOUT, 1), 0)
    lt6 = (row < 6).astype(jnp.float32)
    ndx_c, ndy_c, nd0_c = _ND_COLS

    for gi_ in range(gtiles):
        t = pl.program_id(0) * gtiles + gi_
        px, py = _pixel_grid(t + tile0_ref[0], ntx, tile)
        cnt = counts_ref[t]
        g = gout_ref[gi_]
        gp = g * lt6                             # blend-channel rows only
        g6 = g[6:7, :]                           # depth cotangent (1, P)
        g7 = g[7:8, :]                           # alpha cotangent (1, P)
        g_trans = gtrans_ref[gi_]
        rho = rho_ref[gi_]
        trans_final = transf_ref[gi_]

        def super_body(j, carry, px=px, py=py, cnt=cnt, gi_=gi_, gp=gp,
                       g6=g6, g7=g7, g_trans=g_trans, rho=rho,
                       trans_final=trans_final):
            k0 = pl.multiple_of(j * sb, sb)

            def compute(c):
                sigma, trans = c
                chunk = attrs_ref[gi_, pl.ds(k0, sb), :]
                _, z, z_ok = _surfel_z(chunk, px, py)
                alpha, dx, dy, q, unclamped = _super_alpha(
                    chunk, px, py, "surfel")
                alpha = jnp.where(z_ok & _slot_mask(k0, sb, cnt),
                                  alpha, 0.0)
                one_m = 1.0 - alpha
                one_m_safe = jnp.maximum(one_m, 1e-3)
                excl = _excl_prod(one_m, tri_s, fast)
                T_i = excl * trans
                w = alpha * T_i
                # phi includes the per-pixel depth row and the const
                # alpha row (out_6 = sum w z, out_7 = sum w)
                phi = (_split_dot(chunk[:, :NOUT], gp, ((1,), (0,)), fast)
                       + g6 * z + g7)
                sigma_i = sigma + _tri_matmul(tri_i, w * phi, fast)
                da = (phi * T_i - (rho - sigma_i) / one_m_safe
                      - g_trans * trans_final / one_m_safe)
                active = alpha > 0.0
                da = jnp.where(active, da, 0.0)
                dq = jnp.where(unclamped, -0.5 * alpha * da, 0.0)
                dexp = jnp.where(active & unclamped,
                                 jnp.exp(-0.5 * q) * da, 0.0)
                d_chunk = _geom_grads(chunk, gp, w, dq, dx, dy, dexp,
                                      "surfel", fast)
                # direct depth grad: d out6 / d z_i = w_i g6; z = 1/s
                ds = jnp.where(z_ok, -(z * z) * g6 * w, 0.0)
                red = lambda x: jnp.sum(x, axis=1, keepdims=True)
                d_chunk = (d_chunk
                           + red(ds * px) * _lane_onehot(ndx_c)
                           + red(ds * py) * _lane_onehot(ndy_c)
                           + red(ds) * _lane_onehot(nd0_c))
                dattrs_ref[gi_, pl.ds(k0, sb), :] = d_chunk
                return (sigma_i[sb - 1:sb, :],
                        trans * (excl[sb - 1:sb, :] * one_m[sb - 1:sb, :]))

            def skip(c):
                dattrs_ref[gi_, pl.ds(k0, sb), :] = jnp.zeros(
                    (sb, NCH), jnp.float32)
                return c

            live = (jnp.max(carry[1]) > TRANS_EPS) & (j * sb < cnt)
            return jax.lax.cond(live, compute, skip, carry)

        jax.lax.fori_loop(0, kmax // sb, super_body,
                          (jnp.zeros((1, P), jnp.float32),
                           jnp.ones((1, P), jnp.float32)))


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------

def _t0_arr(tile0):
    if tile0 is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(tile0, jnp.int32).reshape(1)


def _blend_fwd_call(attrs, counts, ntx, nty, tile, sup, mode="3dgs",
                    fast: bool = False, tile0=None):
    T, kmax, _ = attrs.shape
    P = tile * tile
    G = _grid_tiles(T)
    spec_p = lambda c: pl.BlockSpec((G, c, P), lambda t: (t, 0, 0),
                                    memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((T, NOUT, P), jnp.float32),
                  jax.ShapeDtypeStruct((T, 1, P), jnp.float32)]
    out_specs = [spec_p(NOUT), spec_p(1)]
    if mode == "surfel":
        kern = functools.partial(_fwd_kernel_surfel, ntx=ntx, tile=tile,
                                 kmax=kmax, sup=sup, gtiles=G, fast=fast)
        out_shapes.append(jax.ShapeDtypeStruct((T, 1, P), jnp.float32))
        out_specs.append(spec_p(1))
    else:
        kern = functools.partial(_fwd_kernel_3dgs, ntx=ntx, tile=tile,
                                 kmax=kmax, sup=sup, gtiles=G, fast=fast)
    outs = pl.pallas_call(
        kern,
        grid=(T // G,),
        in_specs=[pl.BlockSpec((1,), lambda t: (0,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((T,), lambda t: (0,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((G, kmax, NCH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=INTERPRET,
    )(_t0_arr(tile0), counts, attrs)
    if mode == "surfel":
        return outs
    return outs[0], outs[1], jnp.zeros_like(outs[1])


def _blend_bwd_call(attrs, counts, g_out, g_trans, rho, trans_final, ntx,
                    nty, tile, sup, mode="3dgs", fast: bool = False,
                    tile0=None):
    T, kmax, _ = attrs.shape
    P = tile * tile
    G = _grid_tiles(T)
    kern_fn = (_bwd_kernel_surfel if mode == "surfel"
               else _bwd_kernel_3dgs)
    kern = functools.partial(kern_fn, ntx=ntx, tile=tile, kmax=kmax,
                             sup=sup, gtiles=G, fast=fast)
    specs_p = lambda c: pl.BlockSpec((G, c, P), lambda t: (t, 0, 0),
                                     memory_space=pltpu.VMEM)
    dattrs = pl.pallas_call(
        kern,
        grid=(T // G,),
        in_specs=[
            pl.BlockSpec((1,), lambda t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((T,), lambda t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, kmax, NCH), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            specs_p(NOUT), specs_p(1), specs_p(1), specs_p(1),
        ],
        out_specs=pl.BlockSpec((G, kmax, NCH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, kmax, NCH), jnp.float32),
        interpret=INTERPRET,
    )(_t0_arr(tile0), counts, attrs, g_out, g_trans, rho, trans_final)
    return dattrs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _blend_gaussians(attr16, bins: TileBins, tile0, ntx: int, nty: int,
                     tile: int, sup: int, mode: str = "3dgs",
                     fast: bool = False):
    """(N, 16) attrs + bins -> (T, 8, P) blended channels, (T, 1, P)
    final transmittance, (T, 1, P) median depth (surfel; zeros for 3dgs,
    forward-only either way). One custom_vjp over pack+blend so the
    backward aggregates per-slot grads with a single scatter-add.

    ``tile0``: (1,) i32 global index of bins' first tile (None = 0) —
    nonzero only when the bins are a tile shard (parallel/mesh.py)."""
    attrs = _pack_table(attr16, bins)
    return _blend_fwd_call(attrs, bins.counts, ntx, nty, tile, sup, mode,
                           fast, tile0)


def _blend_g_fwd(attr16, bins, tile0, ntx, nty, tile, sup, mode="3dgs",
                 fast=False):
    attrs = _pack_table(attr16, bins)
    out, trans, med = _blend_fwd_call(attrs, bins.counts, ntx, nty, tile,
                                      sup, mode, fast, tile0)
    return (out, trans, med), (attrs, bins, tile0, out, trans,
                               attr16.shape[0])


def _blend_g_bwd(ntx, nty, tile, sup, mode, fast, res, cotangents):
    attrs, bins, tile0, out, trans, n = res
    g_out, g_trans, _ = cotangents    # median depth is forward-only
    # rho(p) = sum_c g_c O_c — free from the saved outputs
    rho = jnp.sum(g_out * out, axis=1, keepdims=True)     # (T, 1, P)
    dtable = _blend_bwd_call(attrs, bins.counts, g_out, g_trans, rho,
                             trans, ntx, nty, tile, sup, mode, fast,
                             tile0)
    d_attr16 = _unpack_grads(dtable, bins, n)
    return (d_attr16, None, None)


_blend_gaussians.defvjp(_blend_g_fwd, _blend_g_bwd)


# ---------------------------------------------------------------------------
# Per-gaussian blend contributions (forward-only)
# ---------------------------------------------------------------------------

def _contrib_kernel(tile0_ref, counts_ref, attrs_ref, contrib_ref, *,
                    mode: str,
                    ntx: int, tile: int, kmax: int, sup: int, gtiles: int):
    """Per-slot summed blend weights (T, Kmax): the reference rasterizer's
    per-Gaussian ``contributions`` (gaussian_renderer/__init__.py:313-347,
    used to gate the GS-SDF consistency loss at mapper.py:1364-1366).
    Forward-only; aggregated per gaussian by one scatter-add outside."""
    sb = _superblock(kmax, sup)
    tri_s = _tri(True, sb)
    for g in range(gtiles):
        t = pl.program_id(0) * gtiles + g
        px, py = _pixel_grid(t + tile0_ref[0], ntx, tile)
        cnt = counts_ref[t]

        def super_body(j, trans, g=g, px=px, py=py, cnt=cnt):
            k0 = pl.multiple_of(j * sb, sb)

            def compute(tr):
                chunk = attrs_ref[g, pl.ds(k0, sb), :]
                alpha, _, _, _, _ = _super_alpha(chunk, px, py, mode)
                if mode == "surfel":
                    _, _, z_ok = _surfel_z(chunk, px, py)
                    alpha = jnp.where(z_ok, alpha, 0.0)
                alpha = jnp.where(_slot_mask(k0, sb, cnt), alpha, 0.0)
                one_m = 1.0 - alpha
                excl = _excl_prod(one_m, tri_s, True)
                w = alpha * excl * tr
                contrib_ref[g, pl.ds(k0, sb), :] = jnp.sum(
                    w, axis=1, keepdims=True)
                return tr * (excl[sb - 1:sb, :] * one_m[sb - 1:sb, :])

            def skip(tr):
                contrib_ref[g, pl.ds(k0, sb), :] = jnp.zeros(
                    (sb, 1), jnp.float32)
                return tr

            live = (jnp.max(trans) > TRANS_EPS) & (j * sb < cnt)
            return jax.lax.cond(live, compute, skip, trans)

        jax.lax.fori_loop(0, kmax // sb, super_body,
                          jnp.ones((1, tile * tile), jnp.float32))


def blend_contributions(attr16: jnp.ndarray, bins: TileBins,
                        width: int, height: int,
                        tile: int = 16, superblock: int = 64,
                        mode: str = "3dgs") -> jnp.ndarray:
    """(N,) summed blend weight per gaussian over all pixels."""
    ntx = (width + tile - 1) // tile
    nty = (height + tile - 1) // tile
    T = ntx * nty
    n = attr16.shape[0]
    attrs = _pack_table(jax.lax.stop_gradient(attr16), bins)
    kmax = attrs.shape[1]
    G = _grid_tiles(T)
    kern = functools.partial(_contrib_kernel, mode=mode, ntx=ntx,
                             tile=tile, kmax=kmax, sup=superblock,
                             gtiles=G)
    ctab = pl.pallas_call(
        kern,
        grid=(T // G,),
        in_specs=[pl.BlockSpec((1,), lambda t: (0,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((T,), lambda t: (0,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((G, kmax, NCH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        # 3-D output (T, kmax, 1): Mosaic requires the last two block
        # dims divisible by (8, 128) or equal to the array dims — a 2-D
        # (G, kmax) block fails whenever the tile count isn't a multiple
        # of 8 x grid (e.g. 600x340 images -> T=836, G=4)
        out_specs=pl.BlockSpec((G, kmax, 1), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, kmax, 1), jnp.float32),
        interpret=INTERPRET,
    )(_t0_arr(None), bins.counts, attrs)
    idx = jnp.minimum(bins.gauss_tbl.reshape(-1), n - 1)
    flat = jnp.where(bins.mask.reshape(-1), ctab.reshape(-1), 0.0)
    return jnp.zeros((n,)).at[idx].add(flat)


# ---------------------------------------------------------------------------
# Full rasterize with the Pallas blend
# ---------------------------------------------------------------------------

def rasterize_pallas(
    means3d, quats, scales, opacities, colors, valid,
    T_c_w, K, width: int, height: int,
    theta=None, rho=None, bg=None,
    tile: int = 16, max_span: int = 36, max_per_tile: int = 512,
    normalize_depth: bool = True, superblock: int = SUPER,
    precision: str = "high", with_contrib: bool = False,
    mode: str = "3dgs", bins: TileBins | None = None,
    return_bins: bool = False,
    bin_means=None, rebin_drift_px: float = 0.0,
):
    """Drop-in rasterize() with the fused Pallas blend. Forward output
    matches ops.rasterize.rasterize; gradients flow to all gaussian
    parameters and (theta, rho). max_per_tile must be divisible by a
    power-of-two superblock >= 8.

    ``mode``: "3dgs" or "surfel" (the reference default gs_type; per-pixel
    plane depth, blended normals, median depth). 2DGS stays on the XLA
    path.
    ``precision``: "high" = two/three-pass bf16-split MXU dots (~f32,
    what the parity tests pin); "fast" = single-pass bf16 dots (~2^-8
    relative blend error — smaller than the CUDA reference's own
    run-to-run nondeterminism of +-0.1-0.3 PSNR, utils/mapper.py:1702).
    ``bins``: precomputed TileBins to reuse (training-loop amortization);
    None = bin here. ``return_bins``: also return (bins, means2d snapshot)
    for host-side caching + drift guards.
    """
    _superblock(max_per_tile, superblock)   # validates divisibility
    if theta is not None:
        T_c_w = apply_pose_delta(T_c_w, theta, rho)
    if bg is None:
        bg = jnp.zeros(3)
    if mode == "surfel":
        ps = project_surfels(means3d, quats, scales, opacities, colors,
                             valid, T_c_w, K, width, height, mode="surfel")
        base = jax.tree.map(jax.lax.stop_gradient, ps.base)
        attr16 = surfel_attr_matrix(ps, K)
    else:
        p = project_gaussians(means3d, quats, scales, opacities, colors,
                              valid, T_c_w, K, width, height)
        base = jax.tree.map(jax.lax.stop_gradient, p)
        attr16 = gauss_attr_matrix(p)
    bin_means_out = bin_means if bin_means is not None else base.means2d
    if bins is None:
        bin_means_out = base.means2d
        bins = bin_gaussians(base, width, height, tile=tile,
                             max_span=max_span, max_per_tile=max_per_tile)
    elif bin_means is not None and rebin_drift_px > 0:
        # in-graph drift guard: re-bin inside the jit when the projected
        # centers moved past the pixel threshold since the cached table
        # was built — no host sync on the training loop's critical path
        drift = jnp.max(jnp.abs(base.means2d - bin_means))

        def fresh(_):
            b = bin_gaussians(base, width, height, tile=tile,
                              max_span=max_span,
                              max_per_tile=max_per_tile)
            return b, base.means2d

        def keep(_):
            return bins, bin_means

        bins, bin_means_out = jax.lax.cond(drift > rebin_drift_px,
                                           fresh, keep, None)

    ntx = (width + tile - 1) // tile
    nty = (height + tile - 1) // tile
    out, trans, med = _blend_gaussians(attr16, bins, None, ntx, nty, tile,
                                       superblock, mode,
                                       precision == "fast")
    rgb, depth, alpha, normal, depth_median = assemble_blend(
        out, trans, med, bg, width, height, tile, mode, normalize_depth)
    contrib = (blend_contributions(attr16, bins, width, height,
                                   tile=tile, superblock=superblock,
                                   mode=mode)
               if with_contrib else jnp.zeros(means3d.shape[0]))
    ret = RenderOutput(rgb=rgb, depth=depth, alpha=alpha, normal=normal,
                       contrib=contrib, n_overflow=bins.n_overflow,
                       depth_median=depth_median)
    if return_bins:
        return ret, bins, jax.lax.stop_gradient(bin_means_out)
    return ret


def assemble_blend(out, trans, med, bg, width, height, tile, mode,
                   normalize_depth):
    """(T, C, P) kernel outputs -> composited (rgb, depth, alpha, normal,
    depth_median) images. Pure XLA (autodiffed); works on tile-sharded
    inputs (the reshape/transpose is layout-local per tile row)."""
    ntx = (width + tile - 1) // tile
    nty = (height + tile - 1) // tile

    def untile(x):   # (T, C, P) -> (H, W, C)
        c = x.shape[1]
        x = x.reshape(nty, ntx, c, tile, tile)
        x = jnp.transpose(x, (0, 3, 1, 4, 2))
        return x.reshape(nty * tile, ntx * tile, c)[:height, :width]

    img = untile(out)
    tr = untile(trans)[..., 0]
    rgb = img[..., 0:3] + tr[..., None] * bg
    if mode == "surfel":
        normal = img[..., 3:6]
        depth = img[..., 6]
        alpha = img[..., 7]
        depth_median = untile(med)[..., 0]
    else:
        depth = img[..., 3]
        normal = img[..., 4:7]
        alpha = img[..., 7]
        depth_median = None
    if normalize_depth:
        depth = depth / jnp.maximum(alpha, 0.05)  # see blend_tiles note
    return rgb, depth, alpha, normal, depth_median


def blend_gaussians_tile_sharded(mesh, axis: str, attr16, bins: TileBins,
                                 width: int, height: int, tile: int = 16,
                                 superblock: int = SUPER,
                                 mode: str = "3dgs", fast: bool = False):
    """The Pallas blend with the TILE axis sharded over a device mesh
    (VERDICT r3 item 5: the flagship kernel is what must scale).

    Each device runs the fused kernel on its contiguous slice of tiles
    (bins sharded on the leading tile axis, attr16 replicated); the
    kernel receives the shard's global tile offset so pixel coordinates
    stay global. Compositing is per-pixel so no cross-device blend pass
    exists; the backward transposes the replicated attr16 input into a
    psum of per-device gradients (shard_map AD).

    Returns (out, trans, med) as global arrays sharded on the tile axis.
    Requires T % mesh_size == 0.
    """
    nd = int(np.prod([mesh.shape[a] for a in (axis,)]))
    T = bins.counts.shape[0]
    assert T % nd == 0, f"tile count {T} must divide mesh size {nd}"
    T_local = T // nd
    ntx = (width + tile - 1) // tile
    nty = (height + tile - 1) // tile
    from jax.sharding import PartitionSpec as P_

    def shard_fn(attr16_r, bins_l):
        t0 = (jax.lax.axis_index(axis) * T_local).reshape(1)
        return _blend_gaussians(attr16_r, bins_l, t0, ntx, nty, tile,
                                superblock, mode, fast)

    bins_spec = jax.tree.map(
        lambda x: P_(axis) if (hasattr(x, "ndim") and x.ndim >= 1
                               and x.shape[0] == T) else P_(), bins)
    return jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P_(), bins_spec),
        out_specs=(P_(axis), P_(axis), P_(axis)),
        check_vma=False)(attr16, bins)
