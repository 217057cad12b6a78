"""Meshing: SDF grid queries on device + native isosurface extraction.

Reference: utils/mesher.py — build a query grid from an AABB (:168-212),
batched SDF/semantic/color queries with an ``mc_mask`` of trustworthy
cells (= enough neural-point neighbors, :40-166), marching cubes
(:363-391), vertex color painting (:393-429), chunked reconstruction over
large maps (:479-636) with chunking from tools.split_chunks.

TPU split: grid SDF evaluation is a jitted batched query (the flop-heavy
part, runs on device); triangle extraction runs in the native C++ lib
(pings_tpu.native.marching_tetrahedra); chunk orchestration is host-side.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pings_tpu.models import field
from pings_tpu.native import marching_tetrahedra


class Mesher:
    def __init__(self, cfg):
        self.cfg = cfg
        self.sigma_scale = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m

    def query_sdf_grid(
        self, m, decoders, origin: np.ndarray, dims: Tuple[int, int, int],
        res: float, batch: int = 1 << 16,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Evaluate the SDF on a regular grid. Returns (sdf (nx,ny,nz),
        mask (nx,ny,nz)) where mask marks cells with enough neighbors
        (reference mc_mask = nn_count >= mesh_min_nn, mesher.py:100-166)."""
        nx, ny, nz = dims
        xs = origin[0] + np.arange(nx) * res
        ys = origin[1] + np.arange(ny) * res
        zs = origin[2] + np.arange(nz) * res
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)

        sdf_out = np.empty(len(pts), np.float32)
        cnt_out = np.empty(len(pts), np.int32)
        k = self.cfg.query_nn_k
        for i in range(0, len(pts), batch):
            chunk = pts[i:i + batch]
            pad = batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, 3), np.float32)])
            s, _, v, nn = _grid_query(m, decoders, jnp.asarray(chunk),
                                      self.sigma_scale, k,
                                      self.cfg.num_nei_cells,
                                      self.cfg.search_alpha)
            sdf_out[i:i + batch] = np.asarray(s)[:batch - pad or None]
            cnt_out[i:i + batch] = np.asarray(nn)[:batch - pad or None]
        min_nn = min(self.cfg.mesh_min_nn, k)
        mask = cnt_out >= min_nn
        return (sdf_out.reshape(dims), mask.reshape(dims))

    def recon_aabb_mesh(
        self, m, decoders, aabb_min: np.ndarray, aabb_max: np.ndarray,
        res: Optional[float] = None,
        with_colors: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Reconstruct a mesh inside an AABB. Returns (verts, tris,
        colors|None)."""
        cfg = self.cfg
        res = res or cfg.mc_res_m
        pad = cfg.pad_voxel * res
        origin = np.asarray(aabb_min, np.float64) - pad
        extent = np.asarray(aabb_max, np.float64) + pad - origin
        dims = tuple(int(np.ceil(e / res)) + 1 for e in extent)
        if np.prod(dims) > 5e8:  # reference guard mesher.py:203-207
            raise ValueError(f"mesh grid too large: {dims}")
        sdf, mask = self.query_sdf_grid(m, decoders, origin, dims, res)
        if cfg.skip_top_voxel > 0:
            mask[:, :, -cfg.skip_top_voxel:] = False
        verts, tris = marching_tetrahedra(
            sdf, origin, res,
            mask=mask if cfg.mc_mask_on else None)
        colors = None
        if with_colors and len(verts) and cfg.color_on:
            colors = self.query_colors(m, decoders, verts)
        return verts, tris, colors

    def recon_map_mesh(self, m, decoders, chunk_m: float = 20.0,
                       res: Optional[float] = None):
        """Chunked reconstruction over the whole active map
        (reference recon_aabb_collections_mesh, mesher.py:479-636)."""
        n = int(m.count)
        pos = np.asarray(m.positions[:n])
        act = np.asarray(m.valid_mask[:n])
        pos = pos[act]
        if len(pos) == 0:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int32), None)
        lo, hi = pos.min(0), pos.max(0)
        all_v: List[np.ndarray] = []
        all_t: List[np.ndarray] = []
        all_c: List[np.ndarray] = []
        voff = 0
        xs = np.arange(lo[0], hi[0] + chunk_m, chunk_m)
        ys = np.arange(lo[1], hi[1] + chunk_m, chunk_m)
        for cx in xs:
            for cy in ys:
                cmin = np.array([cx, cy, lo[2]])
                cmax = np.minimum(cmin + chunk_m, hi)
                cmax[2] = hi[2]
                inside = np.any(
                    (pos[:, 0] >= cmin[0] - 1) & (pos[:, 0] < cmax[0] + 1)
                    & (pos[:, 1] >= cmin[1] - 1) & (pos[:, 1] < cmax[1] + 1))
                if not inside:
                    continue
                v, t, c = self.recon_aabb_mesh(m, decoders, cmin, cmax, res)
                if len(v) == 0:
                    continue
                all_v.append(v)
                all_t.append(t + voff)
                if c is not None:
                    all_c.append(c)
                voff += len(v)
        if not all_v:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int32), None)
        verts = np.concatenate(all_v)
        tris = np.concatenate(all_t)
        cols = np.concatenate(all_c) if all_c else None
        min_v = getattr(self.cfg, "min_cluster_vertices", 0)
        if min_v and len(tris):
            verts, tris, cols = filter_isolated_clusters(
                verts, tris, cols, min_v)
        return verts, tris, cols

    def query_colors(self, m, decoders, verts: np.ndarray,
                     batch: int = 1 << 16) -> np.ndarray:
        out = np.zeros((len(verts), 3), np.float32)
        for i in range(0, len(verts), batch):
            chunk = np.asarray(verts[i:i + batch], np.float32)
            c, v = field.color_at(m, decoders, jnp.asarray(chunk),
                                  k=self.cfg.query_nn_k,
                                  stencil_r=self.cfg.num_nei_cells,
                                  search_alpha=self.cfg.search_alpha)
            out[i:i + batch] = np.asarray(jnp.where(v[:, None], c, 0.5))
        return out


import functools


@functools.partial(jax.jit, static_argnames=("sigma_scale", "k", "stencil_r",
                                             "search_alpha"))
def _grid_query(m, decoders, pts, sigma_scale, k, stencil_r, search_alpha):
    from pings_tpu.models import neural_points as npm

    q = npm.query_feature(m, pts, k=k, stencil_r=stencil_r,
                          search_alpha=search_alpha)
    from pings_tpu.models import decoder as dec

    per_nb = dec.mlp_forward(decoders["sdf"], q.feat)[..., 0] * sigma_scale
    sdf = jnp.sum(per_nb * q.weights, axis=-1)
    return sdf, q.weights, q.valid, q.nn_count


def filter_isolated_clusters(verts: np.ndarray, tris: np.ndarray,
                             cols, min_vertices: int):
    """Drop mesh connected components with fewer than ``min_vertices``
    vertices (reference filter_isolated_vertices, utils/mesher.py:625-634,
    driven by config.min_cluster_vertices — a vertex count). Components
    via scipy sparse connected_components over the triangle edge graph
    (vectorized; the old pure-Python union-find looped every edge)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    n = len(verts)
    if n == 0 or len(tris) == 0:
        return verts, tris, cols
    rows = np.concatenate([tris[:, 0], tris[:, 1]])
    cls_ = np.concatenate([tris[:, 1], tris[:, 2]])
    g = sp.coo_matrix((np.ones(len(rows), np.int8), (rows, cls_)),
                      shape=(n, n))
    _, root = connected_components(g, directed=False)
    vert_counts = np.bincount(root, minlength=root.max() + 1)
    keep_tri = vert_counts[root[tris[:, 0]]] >= min_vertices
    tris = tris[keep_tri]
    used = np.zeros(n, bool)
    used[tris.reshape(-1)] = True
    remap = np.cumsum(used) - 1
    verts2 = verts[used]
    tris2 = remap[tris].astype(np.int32)
    cols2 = cols[used] if cols is not None else None
    return verts2, tris2, cols2


def write_ply(path: str, verts: np.ndarray, tris: np.ndarray,
              colors: Optional[np.ndarray] = None):
    """Minimal binary-less PLY writer (open3d unavailable)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write(f"element face {len(tris)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        if colors is not None:
            cc = np.clip(colors * 255, 0, 255).astype(np.uint8)
            for v, c in zip(verts, cc):
                f.write(f"{v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        else:
            for v in verts:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
