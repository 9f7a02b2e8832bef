"""Map checkpoint / resume.

The reference carries boost::serialization hooks on its whole object
graph but the top-level SaveAtlas/LoadAtlas is commented out
(inc/System.h:180-186, dead load path src/System.cc:99-163).  Because
our map state is already explicit arrays, checkpointing is trivial and
actually works: one compressed npz per atlas.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from ..frontend.extractor import Features
from .map import Atlas, KeyFrame, SLAMMap

import jax.numpy as jnp


def save_map(mp: SLAMMap, path: str):
    n = mp._next_mp
    kf_ids = sorted(mp.keyframes.keys())
    blobs = dict(
        mp_pos=mp.mp_pos[:n], mp_desc=mp.mp_desc[:n],
        mp_normal=mp.mp_normal[:n], mp_max_dist=mp.mp_max_dist[:n],
        mp_valid=mp.mp_valid[:n], mp_first_kf=mp.mp_first_kf[:n],
        mp_visible=mp.mp_visible[:n], mp_found=mp.mp_found[:n],
        kf_ids=np.asarray(kf_ids, np.int64),
        next_kf=np.asarray([mp._next_kf]),
        obs=np.asarray(
            [(p, k, i) for p, d in mp.obs.items() for k, i in d.items()],
            np.int64,
        ).reshape(-1, 3),
    )
    for k in kf_ids:
        kf = mp.keyframes[k]
        blobs[f"kf{k}_R"] = kf.R
        blobs[f"kf{k}_t"] = kf.t
        blobs[f"kf{k}_meta"] = np.asarray([kf.frame_id, kf.timestamp])
        blobs[f"kf{k}_xy_un"] = kf.xy_un
        blobs[f"kf{k}_octave"] = kf.octave
        blobs[f"kf{k}_angle"] = kf.angle
        blobs[f"kf{k}_desc"] = kf.desc
        blobs[f"kf{k}_valid"] = kf.valid
        blobs[f"kf{k}_kp_mp"] = kf.kp_mp
        blobs[f"kf{k}_xy"] = np.asarray(kf.feats.xy)
        blobs[f"kf{k}_resp"] = np.asarray(kf.feats.response)
        blobs[f"kf{k}_size"] = np.asarray(kf.feats.size)
    np.savez_compressed(path, **blobs)


def load_map(path: str) -> SLAMMap:
    z = np.load(path)
    mp = SLAMMap(capacity=max(len(z["mp_pos"]), 1024))
    n = len(z["mp_pos"])
    mp._next_mp = n
    mp.mp_pos[:n] = z["mp_pos"]
    mp.mp_desc[:n] = z["mp_desc"]
    mp.mp_normal[:n] = z["mp_normal"]
    mp.mp_max_dist[:n] = z["mp_max_dist"]
    mp.mp_valid[:n] = z["mp_valid"]
    mp.mp_first_kf[:n] = z["mp_first_kf"]
    mp.mp_visible[:n] = z["mp_visible"]
    mp.mp_found[:n] = z["mp_found"]
    mp._next_kf = int(z["next_kf"][0])
    mp.obs = {}
    for p, k, i in z["obs"]:
        mp.obs.setdefault(int(p), {})[int(k)] = int(i)
    for k in z["kf_ids"]:
        k = int(k)
        meta = z[f"kf{k}_meta"]
        feats = Features(
            xy=jnp.asarray(z[f"kf{k}_xy"]),
            response=jnp.asarray(z[f"kf{k}_resp"]),
            angle=jnp.asarray(z[f"kf{k}_angle"]),
            octave=jnp.asarray(z[f"kf{k}_octave"]),
            size=jnp.asarray(z[f"kf{k}_size"]),
            desc=jnp.asarray(z[f"kf{k}_desc"]),
            valid=jnp.asarray(z[f"kf{k}_valid"]),
        )
        kf = KeyFrame(
            kid=k, frame_id=int(meta[0]), timestamp=float(meta[1]),
            R=z[f"kf{k}_R"], t=z[f"kf{k}_t"], feats=feats,
            xy_un=z[f"kf{k}_xy_un"], octave=z[f"kf{k}_octave"],
            angle=z[f"kf{k}_angle"], desc=z[f"kf{k}_desc"],
            valid=z[f"kf{k}_valid"], kp_mp=z[f"kf{k}_kp_mp"].copy(),
        )
        mp.keyframes[k] = kf
    return mp
