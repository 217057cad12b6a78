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
