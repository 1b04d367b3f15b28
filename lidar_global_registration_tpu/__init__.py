"""TPU-native global registration of terrestrial-LiDAR scan pairs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`aleksandrina-streltsova/lidar-global-registration` (reference: C++17/PCL/OpenMP,
see /root/reference).  Nothing here is a port: kd-trees become grid-hash
fixed-radius neighbor lists, OpenMP loops become vmapped/fused XLA ops,
block-tiled OpenCV brute-force matching becomes a tiled distance matmul with
on-chip top-k, and the RANSAC/GROR hypothesis loops become batched hypothesis
axes reduced with argmax.

Layering (mirrors reference SURVEY.md section 1):
  utils/   - config, IO, naming, CSV logs           (ref: config.h, io.h, common.cpp)
  ops/     - compute kernels on padded arrays        (ref: downsample.cpp, common.cpp, pcl/*)
  models/  - pipeline assemblies: pyramid, matchers, RANSAC, GROR
  parallel/- device-mesh sharding for batched pairs and sharded matching
"""

__version__ = "0.1.0"

SEED = 566  # reference: include/common.h:25 (#define SEED 566ul)

from lidar_global_registration_tpu.types import (  # noqa: F401
    AlignmentParameters,
    AlignmentResult,
    Cloud,
    Correspondences,
)
