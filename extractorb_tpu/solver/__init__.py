from . import robust, pose_opt, ba  # noqa: F401
