"""The unified neural point map — TPU-native re-design of the reference
``NeuralPoints`` (model/neural_gaussians.py:28-1212).

Key departures from the CUDA/torch reference, driven by XLA's static-shape
compilation model:

- **Capacity-padded buffers.** All per-point arrays have a fixed capacity
  ``cap`` plus one dump row at index ``cap``; ``count`` tracks the active
  prefix. Growth happens by scattering into the prefix — never a realloc
  inside jit. (Reference grows tensors by torch.cat: neural_gaussians.py:330-360.)
- **Fixed-size spatial hash.** Same 3-prime scheme and semantics
  (empty-slot insert / collision overwrite / stale overwrite;
  neural_gaussians.py:214-375) but as a static int32 table updated with
  deterministic two-pass segment_min dedup instead of nondeterministic
  scatter.
- **Dense optimization.** Rather than materializing a separate "local map"
  of nn.Parameters and scattering back (reference reset_local_map /
  assign_local_to_global), gradients flow into the *global* feature arrays;
  only queried rows receive nonzero gradient, and optax applies a dense
  (bandwidth-trivial) update. The reference's travel-distance local-map
  window (neural_gaussians.py:377-479) becomes a per-point boolean
  ``local_mask`` recomputed per frame and honored by queries.
- **Deterministic by construction** — segment ops instead of the
  reference's nondeterministic scatter_reduce (tools.py:962-964).

The query path (``query_feature``) mirrors the reference semantics
(neural_gaussians.py:506-725): fixed stencil of neighbor voxels -> hash
lookup -> distance sort -> K nearest -> per-neighbor feature+offset vectors
and inverse-distance weights; decoding happens per neighbor and predictions
are IDW-blended (PIN-SLAM scheme).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pings_tpu.ops.transforms import (
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
    voxel_hash,
)

INVALID = jnp.int32(-1)


@struct.dataclass
class NeuralPointMap:
    # per-point state; all arrays have cap+1 rows (last row = dump/padding)
    positions: jnp.ndarray      # (cap+1, 3) f32
    quats: jnp.ndarray          # (cap+1, 4) f32 wxyz, local frame of the point
    geo_feat: jnp.ndarray       # (cap+1, F) f32
    color_feat: jnp.ndarray     # (cap+1, Fc) f32
    rgb: jnp.ndarray            # (cap+1, 3) f32
    ts_create: jnp.ndarray      # (cap+1,) i32
    ts_update: jnp.ndarray      # (cap+1,) i32
    certainty: jnp.ndarray      # (cap+1,) f32
    valid_mask: jnp.ndarray     # (cap+1,) bool — false once pruned
    valid_gs_mask: jnp.ndarray  # (cap+1,) bool — false once SDF-invalidated
    local_mask: jnp.ndarray     # (cap+1,) bool — in the current local map
    count: jnp.ndarray          # () i32 — active prefix length
    hash_table: jnp.ndarray     # (H,) i32 — point index or -1
    # static metadata
    resolution: float = struct.field(pytree_node=False)
    buffer_size: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.positions.shape[0] - 1


def init_map(cfg, key: jax.Array | None = None) -> NeuralPointMap:
    cap = cfg.max_points
    F, Fc = cfg.feature_dim, cfg.color_feature_dim
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    kg, kc = jax.random.split(key)
    std = cfg.feature_std
    geo = (jax.random.normal(kg, (cap + 1, F)) * std if std > 0
           else jnp.zeros((cap + 1, F)))
    col = (jax.random.normal(kc, (cap + 1, Fc)) * std if std > 0
           else jnp.zeros((cap + 1, Fc)))
    return NeuralPointMap(
        positions=jnp.zeros((cap + 1, 3)),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (cap + 1, 1)),
        geo_feat=geo.astype(jnp.float32),
        color_feat=col.astype(jnp.float32),
        rgb=jnp.zeros((cap + 1, 3)),
        ts_create=jnp.zeros(cap + 1, jnp.int32),
        ts_update=jnp.zeros(cap + 1, jnp.int32),
        certainty=jnp.zeros(cap + 1),
        valid_mask=jnp.zeros(cap + 1, bool),
        valid_gs_mask=jnp.zeros(cap + 1, bool),
        local_mask=jnp.zeros(cap + 1, bool),
        count=jnp.int32(0),
        hash_table=jnp.full((cfg.buffer_size,), INVALID, jnp.int32),
        resolution=float(cfg.voxel_size_m),
        buffer_size=int(cfg.buffer_size),
    )


# ---------------------------------------------------------------------------
# Insertion (reference: NeuralPoints.update, neural_gaussians.py:214-375)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("dist_stale_ratio",))
def insert_points(
    m: NeuralPointMap,
    pts: jnp.ndarray,           # (M, 3) world frame, voxel-downsampled upstream
    rgb: jnp.ndarray,           # (M, 3)
    mask: jnp.ndarray,          # (M,) valid new observations
    quats: jnp.ndarray,         # (M, 4) initial orientations (e.g. identity or normal-aligned)
    cur_ts: jnp.ndarray,        # () i32 frame id
    travel_dist: jnp.ndarray,   # (max_frames,) f32 cumulative travel dist per frame
    travel_dist_thre: jnp.ndarray,  # () f32 — stale if dist gap exceeds this
    dist_stale_ratio: float = 3.0,
) -> NeuralPointMap:
    """Insert new observations into the map.

    A candidate is admitted when its hash slot is (a) empty, (b) occupied by
    a point further than sqrt(dist_stale_ratio)*resolution (hash collision of
    distinct voxels), or (c) occupied by a *stale* point whose last update is
    more than travel_dist_thre of travel away. Admitted candidates are
    appended to the buffer and (deterministically, one winner per bucket)
    claim the hash slot. Matching existing points get their ts_update and
    certainty refreshed.
    """
    res = m.resolution
    cap = m.capacity
    mask = mask & jnp.all(jnp.isfinite(pts), axis=-1)
    coords = jnp.floor(pts / res).astype(jnp.int32)
    bucket = voxel_hash(coords, m.buffer_size)

    existing = m.hash_table[bucket]               # (M,) idx or -1
    occupied = existing >= 0
    ex_idx = jnp.where(occupied, existing, cap)
    d2 = jnp.sum((pts - m.positions[ex_idx]) ** 2, axis=-1)
    same_voxel = occupied & (d2 <= dist_stale_ratio * res * res)
    gap = jnp.abs(travel_dist[cur_ts] - travel_dist[m.ts_update[ex_idx]])
    stale = occupied & same_voxel & (gap > travel_dist_thre)

    admit = mask & (~occupied | ~same_voxel | stale)
    refresh = mask & same_voxel & ~stale

    # one winner per bucket among admitted candidates (deterministic)
    M = pts.shape[0]
    arange = jnp.arange(M, dtype=jnp.int32)
    cand = jnp.where(admit, arange, jnp.int32(M))
    bsel = jnp.where(admit, bucket, m.buffer_size)
    win = jax.ops.segment_min(cand, bsel, num_segments=m.buffer_size + 1)
    is_winner = admit & (win[bsel] == arange)

    # append winners at the buffer tail
    slot_off = jnp.cumsum(is_winner.astype(jnp.int32)) - 1
    dest = jnp.where(is_winner & (m.count + slot_off < cap),
                     m.count + slot_off, cap)
    n_new = jnp.minimum(jnp.sum(is_winner.astype(jnp.int32)),
                        cap - m.count)

    positions = m.positions.at[dest].set(pts, mode="drop")
    quats_arr = m.quats.at[dest].set(quat_normalize(quats), mode="drop")
    rgb_arr = m.rgb.at[dest].set(rgb, mode="drop")
    ts_c = m.ts_create.at[dest].set(cur_ts, mode="drop")
    ts_u = m.ts_update.at[dest].set(cur_ts, mode="drop")
    cert = m.certainty.at[dest].set(0.0, mode="drop")
    vmask = m.valid_mask.at[dest].set(True, mode="drop")
    vgs = m.valid_gs_mask.at[dest].set(True, mode="drop")
    geo = m.geo_feat.at[dest].set(0.0, mode="drop")
    colf = m.color_feat.at[dest].set(0.0, mode="drop")

    # claim hash slots (winner-only, so no write races)
    hbucket = jnp.where(dest < cap, bucket, m.buffer_size)
    # guard against duplicate bucket writes via a dummy tail entry
    htable = jnp.concatenate([m.hash_table, jnp.zeros((1,), jnp.int32)])
    htable = htable.at[hbucket].set(dest.astype(jnp.int32))
    htable = htable[:-1]

    # refresh matched existing points
    ref_idx = jnp.where(refresh, existing, cap)
    ts_u = ts_u.at[ref_idx].set(cur_ts, mode="drop")

    return m.replace(
        positions=positions, quats=quats_arr, rgb=rgb_arr,
        ts_create=ts_c, ts_update=ts_u, certainty=cert,
        valid_mask=vmask, valid_gs_mask=vgs,
        geo_feat=geo, color_feat=colf,
        count=m.count + n_new, hash_table=htable,
    )


# ---------------------------------------------------------------------------
# Local map mask (reference: reset_local_map, neural_gaussians.py:377-479)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("use_mid_ts",))
def compute_local_mask(
    m: NeuralPointMap,
    cur_pos: jnp.ndarray,        # (3,)
    cur_ts: jnp.ndarray,         # () i32
    travel_dist: jnp.ndarray,    # (max_frames,) f32
    local_radius: jnp.ndarray,   # () f32
    dist_window: jnp.ndarray,    # () f32 travel-dist window
    use_mid_ts: bool = True,
    max_local: int | None = None,
    max_surround: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (local_mask, surrounding_mask) over the point buffer.

    local: within local_radius of cur_pos AND observed within the
    travel-dist window. surrounding: the frozen annulus out to
    1.4*local_radius used as non-optimizable render background
    (neural_gaussians.py:436-479).

    ``max_local`` / ``max_surround``: NEAREST-FIRST capacity truncation.
    The downstream padded views (``jnp.nonzero(mask, size=cap)``) keep
    the first ``cap`` true indices in BUFFER (= insertion) order, so an
    over-cap local window silently kept the oldest points and dropped
    the newest — exactly the frontier the camera looks at. On the r5
    kitti circuit (~2000 pts per meter of track, 63 m radius) the 65536
    cap saturated by frame ~30 and online GS PSNR decayed monotonically
    18 -> 10 as ever more recent geometry went missing. With a cap set,
    the radius adapts (128-bin distance histogram + cumsum, one extra
    device op) so the NEAREST points fill the budget; displaced
    local points fall back into the surrounding mask, which still
    renders (frozen) instead of vanishing."""
    ts = ((m.ts_create + m.ts_update) // 2) if use_mid_ts else m.ts_update
    gap = jnp.abs(travel_dist[cur_ts] - travel_dist[ts])
    time_ok = gap < dist_window
    d = jnp.linalg.norm(m.positions - cur_pos, axis=-1)
    in_r = d < local_radius
    in_sr = d < 1.4 * local_radius
    active = m.valid_mask
    local = active & time_ok & in_r
    surrounding = active & time_ok & in_sr & ~in_r

    nb = 128
    bins = jnp.clip((d / (1.4 * local_radius) * nb).astype(jnp.int32),
                    0, nb - 1)

    def _nearest_first(mask, cap):
        hist = jnp.zeros(nb + 1, jnp.int32).at[
            jnp.where(mask, bins, nb)].add(1)
        cum = jnp.cumsum(hist[:nb])
        # keep whole bins while they fit; always keep >= 1 bin (a single
        # 0.7 m-wide bin over cap is degenerate; nonzero's own
        # truncation bounds that residual case)
        b_keep = jnp.maximum(jnp.sum((cum <= cap).astype(jnp.int32)), 1)
        return mask & (bins < b_keep)

    if max_local is not None:
        kept = _nearest_first(local, max_local)
        surrounding = surrounding | (local & ~kept)
        local = kept
    if max_surround is not None:
        surrounding = _nearest_first(surrounding, max_surround)
    return local.at[-1].set(False), surrounding.at[-1].set(False)


# ---------------------------------------------------------------------------
# Query (reference: query_feature, neural_gaussians.py:506-725)
# ---------------------------------------------------------------------------

def make_stencil(num_nei_cells: int, search_alpha: float) -> np.ndarray:
    """Fixed ball of voxel offsets (reference neighbor_dx,
    neural_gaussians.py:1026-1059): offsets with |o| < r + alpha."""
    r = num_nei_cells
    ax = np.arange(-r, r + 1)
    ox, oy, oz = np.meshgrid(ax, ax, ax, indexing="ij")
    offs = np.stack([ox, oy, oz], axis=-1).reshape(-1, 3)
    keep = np.linalg.norm(offs, axis=-1) < (r + search_alpha)
    return offs[keep].astype(np.int32)


class QueryResult(NamedTuple):
    feat: jnp.ndarray      # (N, K, F+3) neighbor geo features + offsets
    color_feat: jnp.ndarray  # (N, K, Fc+3)
    weights: jnp.ndarray   # (N, K) IDW weights (0 for invalid neighbors)
    nn_idx: jnp.ndarray    # (N, K) neighbor point indices (cap = invalid)
    nn_count: jnp.ndarray  # (N,) number of valid neighbors
    valid: jnp.ndarray     # (N,) has >= 1 neighbor


@functools.partial(
    jax.jit,
    static_argnames=("k", "stencil_r", "search_alpha", "use_local_mask"))
def query_neighbor_idx(
    m: NeuralPointMap,
    qpts: jnp.ndarray,          # (N, 3)
    k: int = 6,
    stencil_r: int = 1,
    search_alpha: float = 0.2,
    use_local_mask: bool = False,
) -> jnp.ndarray:
    """The HEAVY half of a neural-point query: stencil hash lookup +
    K-nearest selection. Returns (N, K) i32 neighbor rows (cap = invalid).

    Split out so one neighbor table can be shared by several evaluations
    of (almost) the same points — the SDF value, its 6 finite-difference
    eikonal probes, and the color decode of a training batch all reuse one
    table. The stencil gathers here touch N*S rows of HBM at random
    (S = |stencil| ~ 27-33); sharing them is the single biggest lever on
    the mapping-loop cost (VERDICT r3 item 2). Non-differentiable by
    construction: call OUTSIDE the loss closure so autodiff never sees
    the (N, S) gathers."""
    stencil = jnp.asarray(make_stencil(stencil_r, search_alpha))  # (S, 3)
    res = m.resolution
    cap = m.capacity
    coords = jnp.floor(qpts / res).astype(jnp.int32)              # (N, 3)
    ncoords = coords[:, None, :] + stencil[None, :, :]            # (N, S, 3)
    h = voxel_hash(ncoords, m.buffer_size)
    idx = m.hash_table[h]                                         # (N, S)
    invalid = idx < 0
    idx = jnp.where(invalid, cap, idx)
    if use_local_mask:
        invalid |= ~m.local_mask[idx]
    else:
        invalid |= ~m.valid_mask[idx]
    npos = m.positions[idx]                                       # (N, S, 3)
    d2 = jnp.sum((qpts[:, None, :] - npos) ** 2, axis=-1)
    max_r2 = ((stencil_r + search_alpha) * res) ** 2
    invalid |= d2 > max_r2
    d2 = jnp.where(invalid, jnp.inf, d2)

    neg_d2, sel = jax.lax.top_k(-d2, k)                           # (N, K)
    kidx = jnp.take_along_axis(idx, sel, axis=1)
    return jnp.where(jnp.isfinite(neg_d2), kidx, cap)


def eval_neighbors(
    m: NeuralPointMap,
    qpts: jnp.ndarray,          # (N, 3)
    kidx: jnp.ndarray,          # (N, K) from query_neighbor_idx
    stencil_r: int = 1,
    search_alpha: float = 0.2,
) -> QueryResult:
    """The LIGHT half: gather the K selected rows, recompute distances /
    IDW weights / offsets for ``qpts``. Differentiable in ``qpts`` (the
    weights and offsets are recomputed here), so evaluating a shared
    neighbor table at slightly shifted points (FD probes, GN iterations)
    stays exact up to the neighbor *selection*, which is piecewise
    constant anyway. Neighbors that fall outside the search radius for
    these particular points are re-invalidated."""
    res = m.resolution
    cap = m.capacity
    kinvalid = kidx >= cap
    npos = m.positions[kidx]                                      # (N, K, 3)
    d2 = jnp.sum((qpts[:, None, :] - npos) ** 2, axis=-1)
    max_r2 = ((stencil_r + search_alpha) * res) ** 2
    kinvalid |= d2 > max_r2
    kidx = jnp.where(kinvalid, cap, kidx)
    d2 = jnp.where(kinvalid, jnp.inf, d2)

    eps = 1e-6
    w = jnp.where(kinvalid, 0.0, 1.0 / (d2 + eps))
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    w = w / jnp.maximum(wsum, eps)

    off = (qpts[:, None, :] - npos) / res                         # (N, K, 3)
    off = jnp.where(kinvalid[..., None], 0.0, off)
    gf = jnp.where(kinvalid[..., None], 0.0, m.geo_feat[kidx])
    cf = jnp.where(kinvalid[..., None], 0.0, m.color_feat[kidx])
    feat = jnp.concatenate([gf, off], axis=-1)
    cfeat = jnp.concatenate([cf, off], axis=-1)
    nn_count = jnp.sum(~kinvalid, axis=-1)
    return QueryResult(feat, cfeat, w, kidx, nn_count, nn_count > 0)


@functools.partial(
    jax.jit,
    static_argnames=("k", "stencil_r", "search_alpha", "use_local_mask"))
def query_feature(
    m: NeuralPointMap,
    qpts: jnp.ndarray,          # (N, 3)
    k: int = 6,
    stencil_r: int = 1,
    search_alpha: float = 0.2,
    use_local_mask: bool = False,
) -> QueryResult:
    """K-nearest neural points via stencil hash lookup + IDW weights.

    Output feature layout per neighbor: [geo_feat(F), (q - p) offset(3)] with
    the offset expressed in the world frame scaled by 1/resolution —
    the decoder learns resolution-relative geometry.

    Composition of query_neighbor_idx (heavy, shareable) and
    eval_neighbors (light, differentiable); callers that evaluate several
    near-identical point sets should call the halves directly.
    """
    kidx = query_neighbor_idx(m, qpts, k, stencil_r, search_alpha,
                              use_local_mask)
    return eval_neighbors(m, qpts, kidx, stencil_r, search_alpha)


def accumulate_certainty(m: NeuralPointMap, q: QueryResult) -> NeuralPointMap:
    """Scatter-add IDW weights into neighbor certainty
    (reference: neural_gaussians.py:664-697 scatter_add_)."""
    flat_idx = q.nn_idx.reshape(-1)
    flat_w = q.weights.reshape(-1)
    cert = m.certainty.at[flat_idx].add(flat_w, mode="drop")
    cert = cert.at[-1].set(0.0)
    return m.replace(certainty=cert)


# ---------------------------------------------------------------------------
# PGO support (reference: adjust_map :911-936, recreate_hash :939-1024,
# prune_map :871-909)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=(0,))
def adjust_map(m: NeuralPointMap, pose_deltas: jnp.ndarray) -> NeuralPointMap:
    """Re-pose every point by the pose-graph correction of its creation
    frame. pose_deltas: (max_frames, 4, 4) f32, T_new @ inv(T_old)."""
    ts = jnp.clip(m.ts_create, 0, pose_deltas.shape[0] - 1)
    D = pose_deltas[ts]                                           # (cap+1, 4, 4)
    pos = jnp.einsum("nij,nj->ni", D[:, :3, :3], m.positions) + D[:, :3, 3]
    dq = rotmat_to_quat(D[:, :3, :3])
    quats = quat_normalize(quat_multiply(dq, m.quats))
    return m.replace(positions=pos, quats=quats)


@functools.partial(jax.jit, donate_argnums=(0,))
def recreate_hash(m: NeuralPointMap,
                  ref_ts: jnp.ndarray | None = None) -> NeuralPointMap:
    """Rebuild the hash table from scratch. Bucket conflicts resolve to the
    most recently updated point (reference time/stability dedup,
    neural_gaussians.py:939-1024). Deterministic two-pass segment_max.

    With ``ref_ts`` given, conflicts instead resolve to the point whose
    creation time is *closest to ref_ts* — the reference re-buckets around
    the loop-candidate frame before verifying a loop closure so the tracker
    registers against the revisited (old) geometry, not the newest points
    (pings.py:576-610 recreate_hash at loop)."""
    cap = m.capacity
    coords = jnp.floor(m.positions / m.resolution).astype(jnp.int32)
    bucket = voxel_hash(coords, m.buffer_size)
    arange = jnp.arange(cap + 1, dtype=jnp.int32)
    active = m.valid_mask & (arange < m.count)
    bsel = jnp.where(active, bucket, m.buffer_size)

    if ref_ts is None:
        ts = jnp.where(active, m.ts_update, -1)
    else:
        ts = jnp.where(active, -jnp.abs(m.ts_create - ref_ts), -(1 << 30))
    best_ts = jax.ops.segment_max(ts, bsel, num_segments=m.buffer_size + 1)
    is_best = active & (ts >= best_ts[bsel])
    cand = jnp.where(is_best, arange, jnp.int32(cap + 1))
    win = jax.ops.segment_min(cand, bsel, num_segments=m.buffer_size + 1)

    table = jnp.full((m.buffer_size + 1,), INVALID, jnp.int32)
    valid_win = win < cap + 1
    table = table.at[jnp.where(valid_win, jnp.arange(m.buffer_size + 1), m.buffer_size)].set(
        jnp.where(valid_win, win, INVALID))
    return m.replace(hash_table=table[:-1])


@functools.partial(jax.jit, donate_argnums=(0,))
def prune_map(m: NeuralPointMap, max_prune_certainty: jnp.ndarray) -> NeuralPointMap:
    """Deactivate low-certainty points (reference prune_map). Callers should
    recreate_hash afterwards."""
    arange = jnp.arange(m.capacity + 1, dtype=jnp.int32)
    keep = m.valid_mask & (m.certainty > max_prune_certainty)
    keep |= arange >= m.count  # never touch unborn rows' flags
    keep &= m.valid_mask
    return m.replace(valid_mask=keep)


def memory_bytes(m: NeuralPointMap) -> int:
    """Map memory model (reference: neural_gaussians.py:203-208)."""
    n = int(m.count)
    per = (m.geo_feat.shape[1] + m.color_feat.shape[1] + 3 + 4 + 3) * 4
    return n * per
