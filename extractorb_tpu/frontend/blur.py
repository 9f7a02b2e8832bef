"""7x7 sigma=2 Gaussian blur applied before descriptor sampling.

Replaces the per-level GaussianBlur(workingMat, Size(7,7), 2, 2,
BORDER_REFLECT_101) in the reference (ORBextractor.cc:1127).

Implementation: separable float32 convolution with the
cv2.getGaussianKernel(7, 2) weights, rounded half-to-even to uint8.
This is within +-1 intensity of this cv2 build's GaussianBlur (cv2 5.0
uses an internal fixed-point path whose exact rounding is deliberately
not chased); FAST keypoints are computed pre-blur so keypoint parity is
unaffected and descriptors stay bitwise-close (a few bits of 256).

The 7-tap separable conv is 14 shifted multiply-adds on the VPU; XLA
fuses it into two passes over VMEM-resident tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel7_sigma2() -> np.ndarray:
    """cv2.getGaussianKernel(7, 2): exp(-x^2/(2*2^2)) normalised."""
    x = np.arange(7, dtype=np.float64) - 3.0
    k = np.exp(-(x * x) / 8.0)
    k /= k.sum()
    return k


_K = _gaussian_kernel7_sigma2().astype(np.float32)


@jax.jit
def gaussian_blur7(img: jnp.ndarray) -> jnp.ndarray:
    """Blur a uint8 image; rolls wrap at edges so only pixels >= 3 from
    the edge are valid (callers pass bordered images)."""
    x = img.astype(jnp.float32)
    k = [float(v) for v in _K]
    rows = sum(k[i] * jnp.roll(x, 3 - i, axis=1) for i in range(7))
    out = sum(k[j] * jnp.roll(rows, 3 - j, axis=0) for j in range(7))
    return jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1,))
def blur_level(bordered: jnp.ndarray, border: int = 19) -> jnp.ndarray:
    """Blur the inner region of a bordered pyramid level, leaving the
    border ring unblurred.

    Matches the reference's memory aliasing: GaussianBlur writes only the
    inner view (the clone in ORBextractor.cc:1122-1127) while descriptor
    sampling may read a couple of pixels beyond it.  The reference's
    out-of-view reads are undefined behaviour (clone row wrap-around); we
    instead expose the reflect-101 border pixels, which is well-defined
    and agrees for all keypoints >= 16 px from the image edge whose
    rotated pattern stays inside the view.
    """
    blurred = gaussian_blur7(bordered)
    h, w = bordered.shape
    inner = blurred[border : h - border, border : w - border]
    return bordered.at[border : h - border, border : w - border].set(inner)
