"""Pallas TPU kernels for the alpha-blend stage of the rasterizer.

The portable XLA blend (ops/rasterize.blend_tiles) materializes large
(T, chunk, P) temporaries and its autodiff backward issues per-chunk
scatters. These kernels keep the whole tile state in VMEM and run the
blend as full-width (SUPER, P) = (256, 256) vector/matrix ops:

- per-gaussian scalars (mean, conic, opacity) live on the sublane axis,
  pixels on the lane axis, so broadcasts need no transposes;
- the prefix products/sums over blend order run on the MXU as one
  triangular (SUPER, SUPER) @ (SUPER, P) matmul — the product in log
  space (exp(tril_strict @ log(1-a))), the sum directly. Measured ~2x
  the whole-kernel throughput of the log2(SUPER) pltpu.roll ladder the
  kernels used before (rolls are cross-sublane shuffles and each step
  rewrites the full (SUPER, P) block);
- channel accumulation and the backward's per-slot direct gradients are
  single MXU matmuls per superblock ((16,K)@(K,P) and (K,P)@(P,16));
- superblocks past the tile's occupancy (bins.counts) or past alpha
  saturation (transmittance < TRANS_EPS) are skipped;
- the backward is a single front-to-back pass using the suffix identity
  (see _bwd_kernel), so fwd+bwd costs about two forwards.

Dataflow (one custom_vjp over the whole pack+blend stage):
- forward: XLA gathers the per-tile packed attribute table (T, Kmax, 16)
  from the per-gaussian attribute matrix (N, 16) via bins.gauss_idx, then
  the Pallas kernel maps it to (T, 16, P) blended channels + (T, 1, P)
  final transmittance.
- backward: the Pallas kernel re-blends front-to-back emitting per-slot
  gradients (T, Kmax, 16); one XLA scatter-add onto bins.gauss_tbl
  aggregates them per gaussian. (Measured on a v5e chip: the scatter-add
  costs ~33 ms at 1.8M slots / ~10 ms at 460k, vs ~240 ms for the
  gather-based inverse-location scheme, ~102 ms for a collision-free
  scatter-SET over pair ids, and ~70 ms of extra sorts either needed.)
  rho = sum_c g_c out_c comes free from the saved forward outputs.
Background compositing and depth normalization stay in XLA (autodiffed).

Attribute channel layout (lane dim, 16 columns) — chosen so the packed
block doubles as the output-attribute matrix (columns 0-7 are exactly
the blended output channels):
  0 r, 1 g, 2 b, 3 depth, 4 nx, 5 ny, 6 nz, 7 const 1.0 (alpha channel),
  8 mu_x, 9 mu_y, 10 conic_a, 11 conic_b, 12 conic_c,
  13 opacity (0 = masked), 14-15 pad.
Output channel layout (16 rows): 0 r, 1 g, 2 b, 3 depth, 4 nx, 5 ny,
6 nz, 7 alpha; rows 8-15 accumulate meaningless products and are ignored
by callers (but kept as true outputs so the rho identity holds for any
cotangent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pings_tpu.ops.rasterize import (
    ProjectedGaussians, RenderOutput, TileBins, apply_pose_delta,
    bin_gaussians, project_gaussians,
)

INTERPRET = False  # set True to run the kernels in interpreter mode (CPU)
SUPER = 256        # gaussians blended per superblock (sublane axis)
NCH = 16           # packed channel columns (attrs and output rows)
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


def _pack_table(attr16: jnp.ndarray, bins: TileBins) -> jnp.ndarray:
    """Gather (N, 16) -> (T, Kmax, 16); masked slots zeroed (their
    opacity column 13 = 0 makes them blend no-ops). One per-slot row
    gather straight off the gaussian-id table."""
    n = attr16.shape[0]
    tbl = attr16[jnp.minimum(bins.gauss_tbl, n - 1)]      # (T, Kmax, 16)
    return jnp.where(bins.mask[..., None], tbl, 0.0)


def _unpack_grads(dtable: jnp.ndarray, bins: TileBins,
                  n: int) -> jnp.ndarray:
    """Aggregate per-slot grads (T, Kmax, 16) -> (N, 16) by scatter-add
    on the gaussian-id table.

    Masked slots carry exactly-zero gradients (their opacity is 0 so
    alpha == 0 and the kernel's active mask kills every term), so no
    mask filter is needed before the add. (A collision-free scatter-SET
    via per-slot pair ids measured 102 ms vs this path's ~10 ms at 460k
    slots on v5e — unique indices do not help XLA TPU scatters.)"""
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
    accuracy at a third of HIGHEST's MXU passes (measured ~1.2x whole-
    kernel speedup, max output drift 5e-5 vs HIGHEST on the bench scene)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _tri_matmul(tri, x, fast: bool = False):
    """tri (bf16-exact) @ x via two one-pass bf16 dots (f32 accumulate);
    fast = one single-pass bf16 dot (~2^-8 relative error)."""
    d = lambda u: jax.lax.dot_general(
        tri, u, (((1,), (0,)), ((), ())),
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
        u, v, (dims, ((), ())), preferred_element_type=jnp.float32)
    if fast:
        return d(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _excl_prod(one_m, tri_s, fast: bool = False):
    """Exclusive prefix product along sublanes via one triangular MXU
    matmul in log space. one_m in [1e-3, 1] (alpha clamps at 0.999)
    keeps the log bounded; where transmittance is non-negligible the
    summed log is O(10), so the exp round-trip error is ~1e-6 relative
    (the all-roll ladder this replaces was ~2x slower end to end)."""
    return jnp.exp(_tri_matmul(tri_s, jnp.log(one_m), fast))


def _super_alpha(chunk, px, py):
    """chunk (SUPER, 16) -> (alpha, dx, dy, q, unclamped), each
    (SUPER, P). Column layout per module docstring."""
    col = lambda c: chunk[:, c:c + 1]                 # (SUPER, 1)
    dx = px - col(8)
    dy = py - col(9)
    q = col(10) * dx * dx + col(12) * dy * dy + 2.0 * col(11) * dx * dy
    araw = col(13) * jnp.exp(-0.5 * q)
    araw = jnp.where((q < CUTOFF_Q) & (araw >= ALPHA_FLOOR), araw, 0.0)
    alpha = jnp.minimum(araw, 0.999)
    return alpha, dx, dy, q, araw < 0.999


def _fwd_kernel(counts_ref, attrs_ref, out_ref, trans_ref, *, ntx: int,
                tile: int, kmax: int, sup: int, gtiles: int, fast: bool):
    """Blend ``gtiles`` tiles per grid step: each grid step costs a fixed
    ~2 us of pipeline overhead on v5e (3600 single-tile steps = ~7 ms of
    pure dispatch), so tiles are batched per step and unrolled."""
    P = tile * tile
    sb = _superblock(kmax, sup)
    tri_s = _tri(True, sb)

    for g in range(gtiles):
        t = pl.program_id(0) * gtiles + g
        px, py = _pixel_grid(t, ntx, tile)
        cnt = counts_ref[t]

        def super_body(j, carry, px=px, py=py, cnt=cnt, g=g):
            acc, trans = carry
            k0 = pl.multiple_of(j * sb, sb)

            def compute(_):
                chunk = attrs_ref[g, pl.ds(k0, sb), :]      # (sb, 16)
                alpha, _, _, _, _ = _super_alpha(chunk, px, py)
                one_m = 1.0 - alpha
                excl = _excl_prod(one_m, tri_s, fast)       # (sb, P)
                w = alpha * excl * trans                    # blend weights
                # acc (16, P) += chunk^T @ w on the MXU
                acc2 = acc + _split_dot(chunk, w, ((0,), (0,)), fast)
                trans2 = trans * (excl[sb - 1:sb, :]
                                  * one_m[sb - 1:sb, :])
                return acc2, trans2

            live = (jnp.max(trans) > TRANS_EPS) & (j * sb < cnt)
            return jax.lax.cond(live, compute, lambda _: carry, None)

        acc0 = jnp.zeros((NCH, P), jnp.float32)
        trans0 = jnp.ones((1, P), jnp.float32)
        acc, trans = jax.lax.fori_loop(0, kmax // sb, super_body,
                                       (acc0, trans0))
        out_ref[g] = acc
        trans_ref[g] = trans


def _lane_onehot(c: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NCH), 1)
    return (lane == c).astype(jnp.float32)


def _bwd_kernel(counts_ref, attrs_ref, gout_ref, gtrans_ref, rho_ref,
                transf_ref, dattrs_ref, *, ntx: int, tile: int, kmax: int,
                sup: int, gtiles: int, fast: bool):
    """Analytic backward, single front-to-back pass with the suffix
    identity
        dL/da_i(p) = T_i phi_i - (rho - sigma_i) / (1 - a_i)
                     - g_trans trans_final / (1 - a_i)
    where phi_i = sum_c g_c attr_c_i, rho = sum_c g_c O_c (computed in
    XLA from the saved forward outputs), sigma_i = running sum of
    w_j phi_j (j <= i), trans_final = saved forward transmittance.
    ``gtiles`` tiles are processed per grid step (see _fwd_kernel)."""
    P = tile * tile
    sb = _superblock(kmax, sup)
    tri_s = _tri(True, sb)
    tri_i = _tri(False, sb)

    for gi_ in range(gtiles):
        _bwd_tile(counts_ref, attrs_ref, gout_ref, gtrans_ref, rho_ref,
                  transf_ref, dattrs_ref, gi_, ntx, tile, kmax, sb, tri_s,
                  tri_i, fast)


def _bwd_tile(counts_ref, attrs_ref, gout_ref, gtrans_ref, rho_ref,
              transf_ref, dattrs_ref, gi_, ntx, tile, kmax, sb, tri_s,
              tri_i, fast):
    P = tile * tile
    gtiles = gout_ref.shape[0]
    t = pl.program_id(0) * gtiles + gi_
    px, py = _pixel_grid(t, ntx, tile)
    cnt = counts_ref[t]
    g = gout_ref[gi_]                       # (16, P)
    g_trans = gtrans_ref[gi_]               # (1, P)
    rho = rho_ref[gi_]                      # (1, P)
    trans_final = transf_ref[gi_]           # (1, P)

    def super_body(j, carry):
        k0 = pl.multiple_of(j * sb, sb)

        def compute(c):
            sigma, trans = c
            chunk = attrs_ref[gi_, pl.ds(k0, sb), :]     # (sb, 16)
            alpha, dx, dy, q, unclamped = _super_alpha(chunk, px, py)
            one_m = 1.0 - alpha
            one_m_safe = jnp.maximum(one_m, 1e-3)
            excl = _excl_prod(one_m, tri_s, fast)
            T_i = excl * trans                               # (sb, P)
            w = alpha * T_i
            # phi (sb, P) = chunk @ g on the MXU
            phi = _split_dot(chunk, g, ((1,), (0,)), fast)
            # inclusive prefix sum of w*phi as one triangular MXU matmul
            sigma_i = sigma + _tri_matmul(tri_i, w * phi, fast)  # (sb, P)
            da = (phi * T_i - (rho - sigma_i) / one_m_safe
                  - g_trans * trans_final / one_m_safe)
            active = alpha > 0.0
            da = jnp.where(active, da, 0.0)
            # alpha = min(opa*exp(-.5q), 0.999): zero grad where clamped
            dq = jnp.where(unclamped, -0.5 * alpha * da, 0.0)
            dexp = jnp.where(active & unclamped,
                             jnp.exp(-0.5 * q) * da, 0.0)
            col = lambda cc: chunk[:, cc:cc + 1]
            red = lambda x: jnp.sum(x, axis=1, keepdims=True)  # (sb,1)
            dopa = red(dexp)
            dA = red(dq * dx * dx)
            dB = red(2.0 * dq * dx * dy)
            dC = red(dq * dy * dy)
            # q = A dx^2 + C dy^2 + 2B dx dy, dx = px - mu_x:
            # dq/dmu_x = -(2A dx + 2B dy), dq/dmu_y = -(2C dy + 2B dx)
            dmux = red(dq * (-2.0 * col(10) * dx - 2.0 * col(11) * dy))
            dmuy = red(dq * (-2.0 * col(12) * dy - 2.0 * col(11) * dx))

            # direct channel grads (sb, 16) = w @ g^T on the MXU;
            # column 7 is the constant-1 alpha row (gradient dropped by
            # the attr-matrix vjp), columns 8-13 add the geometry grads
            # as one-hot outer products (no partial stores).
            d_chunk = _split_dot(w, g, ((1,), (1,)), fast)
            d_chunk = (d_chunk
                       + dmux * _lane_onehot(8) + dmuy * _lane_onehot(9)
                       + dA * _lane_onehot(10) + dB * _lane_onehot(11)
                       + dC * _lane_onehot(12) + dopa * _lane_onehot(13))
            dattrs_ref[gi_, pl.ds(k0, sb), :] = d_chunk
            return (sigma_i[sb - 1:sb, :],
                    trans * (excl[sb - 1:sb, :]
                             * one_m[sb - 1:sb, :]))

        def skip(c):
            dattrs_ref[gi_, pl.ds(k0, sb), :] = jnp.zeros(
                (sb, NCH), jnp.float32)
            return c

        live = (jnp.max(carry[1]) > TRANS_EPS) & (j * sb < cnt)
        return jax.lax.cond(live, compute, skip, carry)

    jax.lax.fori_loop(0, kmax // sb, super_body,
                      (jnp.zeros((1, P), jnp.float32),
                       jnp.ones((1, P), jnp.float32)))


def _grid_tiles(T: int) -> int:
    """Tiles per grid step: largest power of two <= 16 dividing T."""
    for g in (16, 8, 4, 2):
        if T % g == 0:
            return g
    return 1


def _blend_fwd_call(attrs, counts, ntx, nty, tile, sup,
                    fast: bool = False):
    T, kmax, _ = attrs.shape
    P = tile * tile
    G = _grid_tiles(T)
    kern = functools.partial(_fwd_kernel, ntx=ntx, tile=tile, kmax=kmax,
                             sup=sup, gtiles=G, fast=fast)
    out, trans = pl.pallas_call(
        kern,
        grid=(T // G,),
        in_specs=[pl.BlockSpec((T,), lambda t: (0,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((G, kmax, NCH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((G, NCH, P), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, P), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, NCH, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ),
        interpret=INTERPRET,
    )(counts, attrs)
    return out, trans


def _blend_bwd_call(attrs, counts, g_out, g_trans, rho, trans_final, ntx,
                    nty, tile, sup, fast: bool = False):
    T, kmax, _ = attrs.shape
    P = tile * tile
    G = _grid_tiles(T)
    kern = functools.partial(_bwd_kernel, ntx=ntx, tile=tile, kmax=kmax,
                             sup=sup, gtiles=G, fast=fast)
    specs_p = lambda c: pl.BlockSpec((G, c, P), lambda t: (t, 0, 0),
                                     memory_space=pltpu.VMEM)
    dattrs = pl.pallas_call(
        kern,
        grid=(T // G,),
        in_specs=[
            pl.BlockSpec((T,), lambda t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, kmax, NCH), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            specs_p(NCH), specs_p(1), specs_p(1), specs_p(1),
        ],
        out_specs=pl.BlockSpec((G, kmax, NCH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, kmax, NCH), jnp.float32),
        interpret=INTERPRET,
    )(counts, attrs, g_out, g_trans, rho, trans_final)
    return dattrs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _blend_gaussians(attr16, bins: TileBins, ntx: int, nty: int,
                     tile: int, sup: int, small_span: int, max_span: int,
                     fast: bool = False):
    """(N, 16) attrs + bins -> (T, 16, P) blended channels, (T, 1, P)
    final transmittance. One custom_vjp over pack+blend so the backward
    aggregates per-slot grads with a single scatter-add (see
    _unpack_grads; a collision-free scatter-set measured 5x worse)."""
    attrs = _pack_table(attr16, bins)
    return _blend_fwd_call(attrs, bins.counts, ntx, nty, tile, sup, fast)


def _blend_g_fwd(attr16, bins, ntx, nty, tile, sup, small_span, max_span,
                 fast=False):
    attrs = _pack_table(attr16, bins)
    out, trans = _blend_fwd_call(attrs, bins.counts, ntx, nty, tile, sup,
                                 fast)
    return (out, trans), (attrs, bins, out, trans, attr16.shape[0])


def _blend_g_bwd(ntx, nty, tile, sup, small_span, max_span, fast, res,
                 cotangents):
    attrs, bins, out, trans, n = res
    g_out, g_trans = cotangents
    # rho(p) = sum_c g_c O_c — free from the saved outputs
    rho = jnp.sum(g_out * out, axis=1, keepdims=True)     # (T, 1, P)
    dtable = _blend_bwd_call(attrs, bins.counts, g_out, g_trans, rho,
                             trans, ntx, nty, tile, sup, fast)
    d_attr16 = _unpack_grads(dtable, bins, n)
    return (d_attr16, None)


_blend_gaussians.defvjp(_blend_g_fwd, _blend_g_bwd)


def _contrib_kernel(counts_ref, attrs_ref, contrib_ref, *, ntx: int,
                    tile: int, kmax: int, sup: int, gtiles: int):
    """Per-slot summed blend weights (T, Kmax): contribution of every
    table slot to its tile (reference rasterizer's per-Gaussian
    ``contributions``, gaussian_renderer/__init__.py:313-347, used to
    gate the GS-SDF consistency loss at mapper.py:1364-1366).
    Forward-only; aggregated per gaussian by one scatter-add outside."""
    P = tile * tile
    sb = _superblock(kmax, sup)
    tri_s = _tri(True, sb)
    for g in range(gtiles):
        t = pl.program_id(0) * gtiles + g
        px, py = _pixel_grid(t, ntx, tile)
        cnt = counts_ref[t]

        def super_body(j, trans, g=g, px=px, py=py, cnt=cnt):
            k0 = pl.multiple_of(j * sb, sb)

            def compute(tr):
                chunk = attrs_ref[g, pl.ds(k0, sb), :]
                alpha, _, _, _, _ = _super_alpha(chunk, px, py)
                one_m = 1.0 - alpha
                excl = _excl_prod(one_m, tri_s, True)
                w = alpha * excl * tr
                contrib_ref[g, pl.ds(k0, sb)] = jnp.sum(w, axis=1)
                return tr * (excl[sb - 1:sb, :] * one_m[sb - 1:sb, :])

            def skip(tr):
                contrib_ref[g, pl.ds(k0, sb)] = jnp.zeros((sb,), jnp.float32)
                return tr

            live = (jnp.max(trans) > TRANS_EPS) & (j * sb < cnt)
            return jax.lax.cond(live, compute, skip, trans)

        jax.lax.fori_loop(0, kmax // sb, super_body,
                          jnp.ones((1, P), jnp.float32))


def blend_contributions(p: ProjectedGaussians, bins: TileBins,
                        width: int, height: int, tile: int = 16,
                        superblock: int = 64) -> jnp.ndarray:
    """(N,) summed blend weight per gaussian over all pixels."""
    ntx = (width + tile - 1) // tile
    nty = (height + tile - 1) // tile
    T = ntx * nty
    n = p.means2d.shape[0]
    attr16 = jax.lax.stop_gradient(gauss_attr_matrix(p))
    attrs = _pack_table(attr16, bins)
    kmax = attrs.shape[1]
    G = _grid_tiles(T)
    kern = functools.partial(_contrib_kernel, ntx=ntx, tile=tile,
                             kmax=kmax, sup=superblock, gtiles=G)
    ctbl = pl.pallas_call(
        kern,
        grid=(T // G,),
        in_specs=[pl.BlockSpec((T,), lambda t: (0,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((G, kmax, NCH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, kmax), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, kmax), jnp.float32),
        interpret=INTERPRET,
    )(bins.counts, attrs)
    idx = jnp.minimum(bins.gauss_tbl.reshape(-1), n - 1)
    flat = jnp.where(bins.mask.reshape(-1), ctbl.reshape(-1), 0.0)
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
) -> RenderOutput:
    """Drop-in rasterize() with the fused Pallas blend. Forward output
    matches ops.rasterize.rasterize; gradients flow to all gaussian
    parameters and (theta, rho). max_per_tile must be divisible by a
    power-of-two superblock >= 8. ``superblock`` sets the blend-loop
    granularity: smaller blocks terminate earlier on saturated tiles
    (transmittance < TRANS_EPS) at the cost of smaller MXU tiles.
    ``precision``: "high" = two/three-pass bf16-split MXU dots (~f32,
    default, what the parity tests pin); "fast" = single-pass bf16 dots
    (~2^-8 relative blend error — smaller than the CUDA reference's own
    run-to-run nondeterminism of +-0.1-0.3 PSNR, utils/mapper.py:1702)."""
    _superblock(max_per_tile, superblock)   # validates divisibility
    if theta is not None:
        T_c_w = apply_pose_delta(T_c_w, theta, rho)
    if bg is None:
        bg = jnp.zeros(3)
    p = project_gaussians(means3d, quats, scales, opacities, colors, valid,
                          T_c_w, K, width, height)
    p_struct = jax.tree.map(jax.lax.stop_gradient, p)
    bins = bin_gaussians(p_struct, width, height, tile=tile,
                         max_span=max_span, max_per_tile=max_per_tile)

    ntx = (width + tile - 1) // tile
    nty = (height + tile - 1) // tile
    attr16 = gauss_attr_matrix(p)
    out, trans = _blend_gaussians(attr16, bins, ntx, nty, tile,
                                  superblock, min(9, max_span), max_span,
                                  precision == "fast")

    def untile(x):   # (T, C, P) -> (H, W, C)
        c = x.shape[1]
        x = x.reshape(nty, ntx, c, tile, tile)
        x = jnp.transpose(x, (0, 3, 1, 4, 2))
        return x.reshape(nty * tile, ntx * tile, c)[:height, :width]

    img = untile(out)
    tr = untile(trans)[..., 0]
    rgb = img[..., 0:3] + tr[..., None] * bg
    alpha = img[..., 7]
    depth = img[..., 3]
    if normalize_depth:
        depth = depth / jnp.maximum(alpha, 0.05)  # see blend_tiles note
    normal = img[..., 4:7]
    contrib = (blend_contributions(p_struct, bins, width, height,
                                   tile=tile, superblock=superblock)
               if with_contrib else jnp.zeros(means3d.shape[0]))
    return RenderOutput(rgb=rgb, depth=depth, alpha=alpha, normal=normal,
                        contrib=contrib,
                        n_overflow=bins.n_overflow)
