"""Virtual-mesh scaling bench: the sharded BA step at 1/2/4/8 devices.

Runs on the CPU backend with xla_force_host_platform_device_count (the
only way to get a multi-device mesh in this environment — virtual
devices execute SERIALLY on the host, so classic strong-scaling speedup
is not measurable here).  What IS measurable and meaningful is the
COLLECTIVE OVERHEAD of the sharded program: efficiency_d = T_1 / T_d for
the same global problem.  On real multi-chip hardware the same program's
psum rides ICI and the per-device work drops by 1/d.

Prints ONE JSON line {"t1_ms", "t8_ms", "overhead_efficiency_8dev", ...}.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    # the axon plugin can win platform selection despite JAX_PLATFORMS
    # (see tests/conftest.py); force the CPU backend explicitly
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from extractorb_tpu.dist import mesh as dmesh
    from extractorb_tpu.dist import sharded_ba as dba
    from extractorb_tpu.solver import ba as sba

    def project(pc):
        return jnp.stack(
            [500.0 * pc[0] / pc[2] + 320.0, 500.0 * pc[1] / pc[2] + 240.0],
            -1,
        ).reshape(2)

    rng = np.random.default_rng(0)
    K, P = 16, 2048
    O = K * P // 2
    O = ((O + 7) // 8) * 8
    pts = np.stack(
        [rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
         rng.uniform(3, 8, P)], -1,
    ).astype(np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    ts = np.zeros((K, 3), np.float32)
    ts[:, 0] = 0.05 * np.arange(K)
    obs_kf = rng.integers(0, K, O).astype(np.int32)
    obs_mp = rng.integers(0, P, O).astype(np.int32)
    pc = np.einsum("oij,oj->oi", Rs[obs_kf], pts[obs_mp]) + ts[obs_kf]
    uv = np.stack(
        [500 * pc[:, 0] / pc[:, 2] + 320, 500 * pc[:, 1] / pc[:, 2] + 240],
        -1,
    ).astype(np.float32)
    fixed_kf = np.zeros(K, bool)
    fixed_kf[0] = True
    prob = sba.BAProblem(
        R=jnp.asarray(Rs), t=jnp.asarray(ts), points=jnp.asarray(pts),
        obs_kf=jnp.asarray(obs_kf), obs_mp=jnp.asarray(obs_mp),
        obs_uv=jnp.asarray(uv),
        inv_sigma2=jnp.ones(O, jnp.float32),
        obs_valid=jnp.ones(O, bool),
        fixed_kf=jnp.asarray(fixed_kf),
        fixed_mp=jnp.zeros(P, bool),
    )

    out = {}
    times = {}
    # the engine's GBA path: landmark-sharded Schur LM — per-device
    # memory ~1/d in points+obs, psum operands (K,6)/(K,6,6) only
    for n_dev in (1, 2, 4, 8):
        mesh = dmesh.make_mesh(n_dev)
        sprob = dba.relayout_for_schur(prob, n_dev)

        def step():
            r = dba.optimize_schur_sharded(
                mesh, sprob, project, n_iters=4, cg_iters=20
            )
            jax.block_until_ready(r.R)

        step()  # compile
        t = min(_timed(step) for _ in range(3))
        times[n_dev] = t
        out[f"t{n_dev}_ms"] = round(t * 1e3, 2)
    out["overhead_efficiency_8dev"] = round(times[1] / times[8], 3)
    # per-device landmark-block memory actually shrinks ~1/d (the
    # VERDICT §3 scaling criterion): report the local point rows
    out["points_per_device_8dev"] = int(sprob.points.shape[0] // 8)
    print(json.dumps(out))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
