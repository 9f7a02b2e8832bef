"""extractorb_tpu — a TPU-native visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
shanpenghui/ExtractORB (an ORB-SLAM3 learning fork):

- ``frontend``: ORB feature extraction (pyramid, FAST, orientation, rotated
  BRIEF, octree keypoint balancing) as batched, jit-compiled kernels, and
  descriptor matching as bit-plane matmuls on the MXU.
- ``geometry``: camera models and two-view reconstruction (vmapped RANSAC).
- ``solver``: a Levenberg-Marquardt solver with Schur-complement landmark
  elimination that replaces the reference's g2o layer.
- ``imu``: on-manifold IMU preintegration as a ``lax.scan``.
- ``slam``: the map state (SoA pytrees) and the tracking / local-mapping /
  loop-closing pipeline as jit stages driven by a host scheduler.
- ``place``: vocabulary-tree place recognition as batched Hamming argmin.
- ``dist``: device-mesh sharding for distributed bundle adjustment.

Design stance (NOT a port of the C++ reference): state is explicit pytrees of
fixed-shape padded+masked arrays, pipeline stages are pure jit functions, and
the host runs a thin scheduler replacing the reference's thread/mutex fabric
(reference: src/System.cc:180-205 spawns std::threads).
"""

__version__ = "0.1.0"
