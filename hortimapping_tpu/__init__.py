"""hortimapping_tpu — TPU-native (JAX/XLA/Pallas) fruit shape completion + pose estimation.

A ground-up re-design of the capabilities of PRBonn/HortiMapping (IROS'23
"Panoptic Mapping with Fruit Completion and Pose Estimation for Horticultural
Robots") for TPU hardware:

  * the DeepSDF decoder is a jitted MLP (reference: deepsdf/networks/deep_sdf_decoder.py)
  * the latent-code + Sim(3)/SE(3) pose joint optimization is one fused
    Levenberg-Marquardt `lax.while_loop` (reference: wild_completion/optimizer.py)
  * the occlusion-aware differentiable depth/mask render loss is a masked,
    fixed-shape kernel (reference: wild_completion/loss.py)
  * all fruits of a submap are completed in parallel via `vmap`; multi-chip
    scale-out is data parallelism over fruits via `shard_map`.

Layout:
  models/    DeepSDF decoder, checkpoint workspace (torch->npz converter, Orbax)
  ops/       Lie groups, SDF<->occupancy, render/recon residual kernels, robust
             kernels, Pallas fused MLP kernels, mesh extraction
  optim/     fused LM engine (single fruit, vmapped batch, staged, baseline)
  data/      ray sampling, RGB-D back-projection, dataset loaders,
             preprocessing + pose init, PLY I/O, KITTI helpers
  metrics/   Chamfer distance / precision-recall (reference: metrics_3d/)
  pipeline/  end-to-end drivers behind the public entry points
  parallel/  device-mesh helpers, shard_map fruit-parallel execution
  native/    C++ runtime kernels (marching tetrahedra, DBSCAN, NN) via ctypes
  vis/       optional host-side visualizer (stub unless open3d present)
  tools/     synthetic world, decoder training, offline dataset generators

See docs/COMPONENTS.md for the line-by-line reference-to-here mapping.
"""

__version__ = "0.1.0"
