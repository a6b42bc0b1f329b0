"""
nimrud-tpu: a TPU-native point-cloud multiscale feature extraction and
classification framework.

Re-designed from scratch for TPU hardware (JAX / XLA / Pallas / shard_map),
providing the full capability surface of the reference toolkit
(grayhem/nimrud): voxel filtering, nested spatial partitioning, multiscale
local-geometry features (density / centroid displacement / covariance
eigen-features / oriented variants / attribute-vector means), classifier
training and inference, an on-disk cloud archive, evaluation metrics, and
multi-chip tile sharding with halo exchange.

Layer map (bottom to top):
  ops/       -- TPU compute primitives: voxel key packing, static-shape
                unique, closed-form symmetric 3x3 eigensolve, masked moment
                accumulation (MXU matmuls), Pallas fused multiscale kernel.
  utils/     -- host-side data structures: VoxelFilter, FlexCloud,
                nested partitioning (octree / grid with buffered halos).
  features/  -- multiscale feature pipelines (minimal-parity + scaleset
                band pipelines for geometric/oriented/covariance/vector).
  learning/  -- classifiers (random-projection-tree ensemble with batched
                XLA inference, JAX softmax-SGD, sklearn-backed baselines)
                and evaluation metrics.
  parallel/  -- device-mesh tile sharding and ICI halo exchange.
  archive/   -- directory-of-arrays cloud archive (checkpoint/resume).
  workflows/ -- non-interactive end-to-end drivers + CLI.
"""

__version__ = "0.1.0"
