"""pings_tpu — a TPU-native LiDAR-visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of PINGS
(RSS 2025): a point-based implicit neural map that unifies a Gaussian
splatting radiance field and a neural signed distance field, with LiDAR
odometry, loop closure, meshing and novel-view rendering.

Layer map (mirrors SURVEY.md §1, re-architected for TPU):

- ``pings_tpu.ops``       — pure-JAX / Pallas kernels: transforms, spatial
                            hash, voxel downsampling, rasterization, SSIM.
- ``pings_tpu.models``    — the neural point map, decoder MLPs, Gaussian
                            spawning and the render path.
- ``pings_tpu.mapping``   — SDF sampling, losses, and the jitted training
                            steps (sdf_step / gsdf_step) + replay pools.
- ``pings_tpu.odometry``  — SDF-registration tracker (GN/LM on device,
                            f64 pose composition on host).
- ``pings_tpu.slam``      — host-side orchestration: pose graph, loop
                            detection, meshing.
- ``pings_tpu.parallel``  — device-mesh sharding (pjit/shard_map) for
                            multi-chip rendering and training.
- ``pings_tpu.data``      — dataset loaders and the frame pipeline.
- ``pings_tpu.eval``      — trajectory / image / mesh metrics.
"""

__version__ = "0.1.0"

import jax as _jax

# f32 matmul precision everywhere: TPU's default single-pass-bf16 matmuls
# destabilize the joint GS+SDF training — on the validation scenes PSNR
# collapses mid-run (22 -> 14 on the sphere fixture; plateau at ~7 on
# replica_synth) while the identical program at f32 precision converges
# to 30+. The CUDA reference computes f32 throughout, so f32 is parity.
# The Pallas kernels are unaffected: their deliberately-bf16 blend dots
# pin precision=DEFAULT explicitly (ops/raster_pallas.py), and bench.py's
# "fast" mode keeps its single-pass bf16 speed.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the SLAM pipeline compiles ~dozens of
# jitted steps (per image-pyramid shape, per iteration count, per
# freeze-phase variant); on the tunneled TPU a cold run spends several
# minutes compiling (e.g. the freeze_after_frame transition alone costs
# ~190 s mid-run). The cache makes reruns and validation sweeps skip all
# of it. Override the location with PINGS_JAX_CACHE_DIR; disable with
# PINGS_JAX_CACHE_DIR=0.
import os as _os

_cache = _os.environ.get("PINGS_JAX_CACHE_DIR",
                         _os.path.expanduser("~/.cache/pings_tpu_jax"))
if _cache and _cache != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the cache config — run uncached
