from . import robust, pose_opt, ba, pose_graph, pnp, inertial  # noqa: F401
