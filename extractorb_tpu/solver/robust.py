"""Robust kernels as IRLS weights.

Replaces g2o's RobustKernelHuber (used throughout the reference's
Optimizer, e.g. src/Optimizer.cc:935 with delta = sqrt(5.991)).  In the
normal-equations formulation the Huber kernel becomes an observation
weight w = rho'(chi2): 1 inside the delta band, delta/|r| outside.
"""

from __future__ import annotations

import jax.numpy as jnp

# chi2 thresholds (2 dof mono, 3 dof stereo) used across the reference
CHI2_MONO = 5.991
CHI2_STEREO = 7.815
DELTA_MONO = CHI2_MONO ** 0.5
DELTA_STEREO = CHI2_STEREO ** 0.5


def huber_weight(chi2, delta):
    """IRLS weight for the Huber kernel: w = min(1, delta / sqrt(chi2))."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.minimum(1.0, delta / e)
