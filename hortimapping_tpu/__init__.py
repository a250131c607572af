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
  models/    DeepSDF decoder, checkpoint workspace + torch->pytree converter
  ops/       Lie groups, SDF queries + input Jacobians, render/recon residual
             kernels, robust kernels, rays, chamfer, marching cubes, sampling
  optim/     fused LM engine (single fruit and vmapped fruit batches)
  data/      render-data construction, dataset loaders, preprocessing, PLY I/O
  metrics/   Chamfer distance / precision-recall (reference: metrics_3d/)
  parallel/  device-mesh helpers, shard_map fruit-parallel execution
  native/    C++ runtime kernels (marching cubes, DBSCAN, NN search) via ctypes
  vis/       optional host-side visualizer (stub unless open3d present)
"""

__version__ = "0.1.0"
