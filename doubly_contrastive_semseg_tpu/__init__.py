"""doubly_contrastive_semseg_tpu — TPU-native JAX/Flax/Pallas rebuild of
"Doubly Contrastive End-to-End Semantic Segmentation for Autonomous Driving
under Adverse Weather" (BMVC 2022).

A from-scratch, TPU-first framework with the capabilities of the reference
PyTorch implementation (`andyj1/doubly-contrastive-semseg`):

- ``models``   — SwiftNet pyramid (ResNet-18/34), DeepLabV3/V3+, ENet, blocks.
- ``losses``   — boundary-aware focal, SupCon/SimCLR, pixel contrast (all
                 static-shape, jittable).
- ``data``     — ACDC / Cityscapes datasets, host-side augmentation pipeline
                 with per-class Euclidean distance-transform boundary weights.
- ``metrics``  — on-device streaming confusion matrices, per-weather mIoU.
- ``parallel`` — device-mesh data parallelism via jax.sharding (GSPMD);
                 cross-replica batch norm falls out of batch sharding.
- ``ops``      — resize ops matching the reference's interpolation semantics,
                 Pallas kernels for the hot paths.
- ``train``    — train/validate loops, optax optimizer groups, orbax
                 checkpoints.

Everything under a jitted step uses static shapes and functional transforms;
scale-out is a device-mesh sharding annotation, never a hand-written
communication layer.
"""

__version__ = "0.1.0"
