"""System facade: the user-facing API.

Replaces System (reference: src/System.cc:41 ctor, :346 TrackMonocular,
:448 Shutdown, :480/:573 SaveTrajectoryTUM/EuRoC).  Instead of spawning
LocalMapping/LoopClosing/Viewer threads (src/System.cc:180-205), the
host scheduler drives the jit pipeline stages synchronously with bounded
work per frame.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import SLAMConfig, load_yaml
from ..core import lie
from .tracking import Tracker, TrackState


class System:
    def __init__(
        self,
        cfg: Optional[SLAMConfig] = None,
        settings_yaml: Optional[str] = None,
        vocab=None,
        vocab_path: Optional[str] = None,
    ):
        if cfg is None:
            cfg = load_yaml(settings_yaml) if settings_yaml else SLAMConfig()
        self.cfg = cfg
        if vocab is None and vocab_path:
            from ..place.vocab import Vocabulary, load_orbvoc_text

            if vocab_path.endswith(".txt"):
                vocab = load_orbvoc_text(vocab_path)
            else:
                vocab = Vocabulary.load(vocab_path)
        self.tracker = Tracker(cfg, vocab=vocab)

    @staticmethod
    def _to_gray(img: np.ndarray) -> np.ndarray:
        if img.ndim == 3:
            # cvtColor equivalent: BGR -> gray (reference Tracking.cc:1042)
            img = np.round(
                0.114 * img[..., 0] + 0.587 * img[..., 1] + 0.299 * img[..., 2]
            ).astype(np.uint8)
        return img

    def track_monocular(
        self, img: np.ndarray, timestamp: float, imu=None
    ) -> TrackState:
        """Reference System::TrackMonocular (src/System.cc:346).  For
        inertial sensors, `imu` is the list of (t, acc(3,), gyro(3,))
        measurements since the previous frame (vImuMeas)."""
        return self.tracker.track(self._to_gray(img), timestamp, imu=imu)

    def track_stereo(
        self, img_left: np.ndarray, img_right: np.ndarray, timestamp: float,
        imu=None,
    ) -> TrackState:
        """Reference System::TrackStereo (src/System.cc:222).  Images must
        be rectified; Camera.bf must be set in the config."""
        return self.tracker.track_stereo(
            self._to_gray(img_left), self._to_gray(img_right), timestamp,
            imu=imu,
        )

    def track_rgbd(
        self, img: np.ndarray, depthmap: np.ndarray, timestamp: float
    ) -> TrackState:
        """Reference System::TrackRGBD (src/System.cc:288).  depthmap is
        metric depth (float, 0/negative = invalid)."""
        return self.tracker.track_rgbd(
            self._to_gray(img), depthmap, timestamp
        )

    @property
    def state(self) -> TrackState:
        return self.tracker.state

    def flush(self):
        """Settle in-flight pipelined frames (tracking.pipeline_depth >
        0): states, trajectory rows, and pending keyframe decisions."""
        self.tracker.flush()

    def current_pose(self):
        self.tracker.flush()
        f = self.tracker.last_frame
        if f is None or f.R is None:
            return None
        return f.R, f.t

    def n_map_points(self) -> int:
        mp = self.tracker.atlas.current
        return int(mp.mp_valid[: mp._next_mp].sum())

    def n_keyframes(self) -> int:
        return len(self.tracker.atlas.current.keyframes)

    def save_trajectory_tum(self, path: str):
        """SaveTrajectoryTUM (reference src/System.cc:480): one line per
        frame 'ts tx ty tz qx qy qz qw' with camera-to-world pose."""
        import jax.numpy as jnp

        with open(path, "w") as f:
            for ts, R, t in self.tracker.final_trajectory():
                Rwc = R.T
                twc = -R.T @ t
                q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))  # (w,x,y,z)
                f.write(
                    f"{ts:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_trajectory_euroc(self, path: str):
        """SaveTrajectoryEuRoC (reference src/System.cc:573): nanosecond
        timestamps, 'ts tx ty tz qx qy qz qw'."""
        import jax.numpy as jnp

        with open(path, "w") as f:
            for ts, R, t in self.tracker.final_trajectory():
                Rwc = R.T
                twc = -R.T @ t
                q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))
                f.write(
                    f"{ts * 1e9:.0f} {twc[0]:.9f} {twc[1]:.9f} {twc[2]:.9f} "
                    f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n"
                )

    def save_trajectory_kitti(self, path: str):
        """SaveTrajectoryKITTI (reference src/System.cc:748): one 3x4
        row-major camera-to-world matrix per line."""
        with open(path, "w") as f:
            for _, R, t in self.tracker.final_trajectory():
                Rwc = R.T
                twc = -R.T @ t
                vals = [
                    Rwc[0, 0], Rwc[0, 1], Rwc[0, 2], twc[0],
                    Rwc[1, 0], Rwc[1, 1], Rwc[1, 2], twc[1],
                    Rwc[2, 0], Rwc[2, 1], Rwc[2, 2], twc[2],
                ]
                f.write(" ".join(f"{v:.9e}" for v in vals) + "\n")

    def shutdown(self):
        pass
