"""Formulation probe for the fwd blend kernel's prefix-product stage.

Measured on the v5e tunnel (slope method: M in-jit iterations, host
sync, (t_M2-t_M1)/dM -- direct per-dispatch timing through the tunnel
is unreliable, it under-reports until the first heavy compile):

  cur   (log -> tri-matmul bf16 -> exp)      2.76 ms
  hs    (Hillis-Steele shifted f32 multiply) 2.01 ms   <- shipped (r5)
  noexp (tri-matmul only, WRONG, cost floor) 1.75 ms

hs is also exact: no log/exp round-trip, no one-pass-bf16 matmul error
(max |out| delta vs cur 2e-3 = cur's own fast-mode error).

Variants (all (T=3600, kmax=128, P=256), gtiles=16, fast mode):
  cur      current: log -> tri-matmul (1-pass bf16) -> exp
  noexp    skip log/exp: excl = tri@one_m (WRONG result, costs only)
  noalpha  alpha = const (skip _super_alpha exp/cutoff), keep prefix
  hs       Hillis-Steele sublane-shift prefix product (exact, no log/exp)
  hs_noa   hs + const alpha (both transcendental sites removed)
"""
import time, sys
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, KMAX, TILE, NCH, NOUT = 3600, 128, 16, 16, 8
P = TILE*TILE
GT = 16
NTX = 80
TRANS_EPS = 1e-4
CUTOFF_Q = 18.42
ALPHA_FLOOR = 1.0/255.0

def _tri(sb):
    r = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 1)
    return (r > c).astype(jnp.bfloat16)

def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,),(0,)), ((),())),
        precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32)

def _pixel_grid(t, ntx, tile):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile*tile), 1)
    tx = (t % ntx) * tile
    ty = (t // ntx) * tile
    px = (tx + lane % tile).astype(jnp.float32)+0.5
    py = (ty + lane // tile).astype(jnp.float32)+0.5
    return px, py

def _super_alpha(chunk, px, py, const=False):
    col = lambda c: chunk[:, c:c+1]
    if const:
        return jnp.broadcast_to(col(13)*0.5, (KMAX, P))
    dx = px - col(8); dy = py - col(9)
    q = col(10)*dx*dx + col(12)*dy*dy + 2.0*col(11)*dx*dy
    araw = col(13)*jnp.exp(-0.5*q)
    araw = jnp.where((q < CUTOFF_Q) & (araw >= ALPHA_FLOOR), araw, 0.0)
    return jnp.minimum(araw, 0.999)

def make_kernel(variant):
    def kern(counts_ref, attrs_ref, out_ref, trans_ref):
        tri_s = _tri(KMAX)
        for g in range(GT):
            t = pl.program_id(0)*GT + g
            px, py = _pixel_grid(t, NTX, TILE)
            cnt = counts_ref[t]
            chunk = attrs_ref[g]                      # (KMAX,16)
            alpha = _super_alpha(chunk, px, py, const=variant in ("noalpha","hs_noa"))
            iota = jax.lax.broadcasted_iota(jnp.int32, (KMAX,1), 0)
            alpha = jnp.where(iota < cnt, alpha, 0.0)
            one_m = 1.0 - alpha
            if variant in ("cur","noalpha"):
                excl = jnp.exp(_dot(tri_s, jnp.log(one_m).astype(jnp.bfloat16)))
            elif variant == "noexp":
                excl = _dot(tri_s, one_m.astype(jnp.bfloat16))
            else:  # hs / hs_noa: Hillis-Steele inclusive-shifted product
                x = one_m
                sh = 1
                while sh < KMAX:
                    pad = jnp.ones((sh, P), jnp.float32)
                    x = x * jnp.concatenate([pad, x[:KMAX-sh]], axis=0)
                    sh *= 2
                # x now inclusive prefix product; exclusive = shift by 1
                excl = jnp.concatenate([jnp.ones((1,P),jnp.float32), x[:KMAX-1]], axis=0)
            w = (alpha * excl).astype(jnp.float32)
            acc = _dot(chunk[:, :NOUT].T.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
            out_ref[g] = acc
            trans_ref[g] = (excl[KMAX-1:KMAX,:]*one_m[KMAX-1:KMAX,:]).astype(jnp.float32)
    return kern

def build(variant, M):
    kern = make_kernel(variant)
    def call(counts, attrs):
        return pl.pallas_call(
            kern, grid=(T//GT,),
            in_specs=[pl.BlockSpec((T,), lambda i:(0,), memory_space=pltpu.SMEM),
                      pl.BlockSpec((GT,KMAX,NCH), lambda i:(i,0,0))],
            out_specs=[pl.BlockSpec((GT,NOUT,P), lambda i:(i,0,0)),
                       pl.BlockSpec((GT,1,P), lambda i:(i,0,0))],
            out_shape=[jax.ShapeDtypeStruct((T,NOUT,P), jnp.float32),
                       jax.ShapeDtypeStruct((T,1,P), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(counts, attrs)
    @jax.jit
    def run(counts, attrs):
        def body(i, carry):
            a, s = carry
            o, tr = call(counts, a)
            # data dependency: fold a scalar of the output back in
            s = s + o[0,0,0]
            return a + s*1e-30, s
        a, s = jax.lax.fori_loop(0, M, body, (attrs, jnp.float32(0)))
        return s
    return run

def timeit(fn,*a,iters=12,warmup=3):
    for _ in range(warmup): out=fn(*a)
    jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(iters): out=fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters*1e3

rng = np.random.default_rng(0)
attrs = np.zeros((T,KMAX,NCH), np.float32)
attrs[:,:,8] = rng.uniform(0,1280,(T,KMAX)); attrs[:,:,9]=rng.uniform(0,720,(T,KMAX))
attrs[:,:,10]=0.05; attrs[:,:,12]=0.05; attrs[:,:,11]=0.0
attrs[:,:,13]=rng.uniform(0.3,0.9,(T,KMAX))
attrs[:,:,:3]=rng.random((T,KMAX,3))
attrs=jnp.asarray(attrs)
counts=jnp.full((T,), KMAX, jnp.int32)
import time as _t
for v in ("cur","hs","noexp"):
    try:
        times={}
        for M in (2, 12):
            run=build(v, M)
            float(run(counts,attrs))  # compile+warm
            t0=_t.perf_counter()
            for _ in range(4): float(run(counts,attrs))
            times[M]=(_t.perf_counter()-t0)/4*1e3
        slope=(times[12]-times[2])/10
        print(f"{v:8s} per-call {slope:7.3f} ms   (M2 {times[2]:.1f} M12 {times[12]:.1f})")
    except Exception as e:
        print(f"{v:8s} FAIL {str(e)[:300]}")
