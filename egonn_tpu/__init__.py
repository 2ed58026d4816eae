"""egonn_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of the EgoNN framework.

EgoNN ("Egocentric Neural Network for Point Cloud Based 6DoF Relocalization at the
City Scale", RA-L 2022; reference implementation: jac99/Egonn) extracts from a single
rotating-LiDAR scan a 256-d global descriptor for place retrieval and a set of
keypoints + 128-d local descriptors + per-keypoint uncertainties used for RANSAC-based
6DoF pose estimation.

This package is a from-scratch TPU-first redesign:

* The MinkowskiEngine sparse-voxel substrate is replaced by fixed-capacity, batched,
  masked voxel buffers (`egonn_tpu.sparse`) with a device-side linear-probing hash
  table for voxel dedup and kernel-map construction — everything jit-compiles with
  static shapes.
* Sparse convolutions are gather -> matmul -> accumulate programs that XLA maps onto
  the MXU (`egonn_tpu.sparse.conv`).
* Models are flax.linen modules (`egonn_tpu.models`).
* Losses (batch-hard triplet with masks, probabilistic chamfer, correspondence loss)
  are fully vectorized masked device kernels (`egonn_tpu.losses`).
* Training runs under jit over a `jax.sharding.Mesh` (data-parallel, embeddings
  all-gathered across chips for global batch-hard mining) (`egonn_tpu.train`,
  `egonn_tpu.parallel`).
* Evaluation (retrieval + batched 6DoF RANSAC) runs on device (`egonn_tpu.eval`).
"""

__version__ = "0.1.0"
