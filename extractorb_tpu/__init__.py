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

import os as _os

import jax as _jax

# TPU f32 matmuls default to one-pass bf16 operand rounding, which is
# silently lossy for this engine's exact fixed-point kernels (the
# pyramid's 11-bit interpolation weights exceed bf16's 8-bit mantissa:
# frontend/pyramid.py) and for solver Jacobian products.  Force full
# f32-effective precision for f32 matmuls; hot paths that want the MXU's
# fast path (BRIEF one-hot contractions, bit-plane Hamming) pass
# explicit bf16 operands and are unaffected by this flag.
#
# This is a process-global knob, so the override is polite: it applies
# only when nobody has configured the flag (jax default: None), and can
# be suppressed entirely with EXTRACTORB_TPU_NO_PRECISION_OVERRIDE=1 —
# but then the extraction-parity guarantees (bitwise cv2-equal blur /
# descriptors) no longer hold on TPU.
if (
    _os.environ.get("EXTRACTORB_TPU_NO_PRECISION_OVERRIDE", "0") != "1"
    and _jax.config.jax_default_matmul_precision is None
):
    _jax.config.update("jax_default_matmul_precision", "highest")
