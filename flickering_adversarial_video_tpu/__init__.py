"""flickering_adversarial_video_tpu — TPU-native flickering adversarial video attacks.

A JAX/Flax/XLA (+Pallas) framework with the full capabilities of
roiponytch/Flickering_Adversarial_Video: flickering perturbations delta(t) of
shape [T,1,1,3] (one RGB offset per frame, broadcast over HxW) and L1,2 sparse
perturbations [T,H,W,3], optimized against frozen 3D-CNN action recognizers
(I3D, R(2+1)D-18, R3D-18, MC3-18) via a single jitted attack step, data-parallel
over a TPU mesh.

Layering (bottom-up):
  models/    Flax victim networks (frozen)
  attack/    pure-functional perturbation algebra, losses, regularizers, metrics
  ops/       on-device preprocessing + Pallas fused kernels
  engine/    jitted attack steps, loops, checkpointing
  parallel/  device mesh + sharding specs
  data/      tfrecord/npy/mp4 pipelines
  convert/   reference-checkpoint -> Flax parameter converters
  runners/   CLI drivers (single-video / class-gen / universal), run_config.yml
  viz/       result artifacts, plots, TensorBoard
"""

__version__ = "0.1.0"
