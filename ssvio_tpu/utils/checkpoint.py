"""Map / session checkpointing: save and resume a SLAM run.

The reference has NO persistence beyond the final TUM trajectory export
(SURVEY §5: no map save/load, no mid-run resume). This module adds it:
the full engine state — device map window, feature state, pose, status,
host keyframe records, odometry/loop edges — round-trips through one
compressed .npz, so a run can stop and resume, or a built map can be
re-loaded for localization-only replays.
"""

from __future__ import annotations

import json

import numpy as np


def save_checkpoint(system, path: str) -> None:
    """Serialize a System's full SLAM state to `path` (.npz)."""
    import jax.numpy as jnp

    m = system.map
    meta = {
        "status": int(system.status),
        "frame_id": int(system.frame_id),
        "stats": {k: v for k, v in system.stats.items() if k != "track_ms"},
        "keyframes": [
            {"gid": int(k["gid"]), "frame_id": int(k["frame_id"]),
             "timestamp": float(k["timestamp"]),
             "T_cw": np.asarray(k["T_cw"]).tolist()}
            for k in system.keyframes
        ],
        "kf_rel_edges": [
            {"a": int(a), "b": int(b), "Z": np.asarray(Z).tolist()}
            for a, b, Z in system.kf_rel_edges
        ],
    }
    arrays = {
        "kf_pose": np.asarray(m.kf_pose), "kf_gid": np.asarray(m.kf_gid),
        "kf_valid": np.asarray(m.kf_valid), "lm_pos": np.asarray(m.lm_pos),
        "lm_valid": np.asarray(m.lm_valid), "lm_gid": np.asarray(m.lm_gid),
        "lm_first_kf": np.asarray(m.lm_first_kf),
        "obs_uv": np.asarray(m.obs_uv), "obs_valid": np.asarray(m.obs_valid),
        "next_lm_gid": np.asarray(m.next_lm_gid),
        "next_kf_gid": np.asarray(m.next_kf_gid),
        "T_cw": np.asarray(system.T_cw),
        "rel_motion": np.asarray(system.rel_motion),
        "feat_xy": np.asarray(system.feat.xy),
        "feat_lm_slot": np.asarray(system.feat.lm_slot),
        "feat_lm_gid": np.asarray(system.feat.lm_gid),
        "feat_valid": np.asarray(system.feat.valid),
        "feat_octave": np.asarray(system.feat.octave),
        "trajectory_ts": np.asarray([t for t, _, _ in system.trajectory]),
        "trajectory_fid": np.asarray([f for _, f, _ in system.trajectory]),
        "trajectory_T": (np.stack([T for _, _, T in system.trajectory])
                         if system.trajectory else np.zeros((0, 3, 4))),
        "meta_json": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    }
    if system.last_pyr is not None:
        # finest pyramid level = the (padded) last image; the pyramid is
        # rebuilt from it on load so tracking resumes seamlessly
        arrays["last_img"] = np.asarray(system.last_pyr.levels[0])
    np.savez_compressed(path, **arrays)


def load_checkpoint(system, path: str) -> None:
    """Restore state saved by save_checkpoint into a compatible System
    (same capacities). The next run_step/run_chunk continues the session."""
    import jax.numpy as jnp

    from ssvio_tpu import frontend as fe

    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["meta_json"]).decode())

    m = system.map
    system.map = m._replace(
        kf_pose=jnp.asarray(z["kf_pose"]), kf_gid=jnp.asarray(z["kf_gid"]),
        kf_valid=jnp.asarray(z["kf_valid"]), lm_pos=jnp.asarray(z["lm_pos"]),
        lm_valid=jnp.asarray(z["lm_valid"]), lm_gid=jnp.asarray(z["lm_gid"]),
        lm_first_kf=jnp.asarray(z["lm_first_kf"]),
        obs_uv=jnp.asarray(z["obs_uv"]),
        obs_valid=jnp.asarray(z["obs_valid"]),
        next_lm_gid=jnp.asarray(z["next_lm_gid"]),
        next_kf_gid=jnp.asarray(z["next_kf_gid"]))
    system.T_cw = jnp.asarray(z["T_cw"])
    system.rel_motion = jnp.asarray(z["rel_motion"])
    system.feat = fe.FeatState(
        xy=jnp.asarray(z["feat_xy"]),
        lm_slot=jnp.asarray(z["feat_lm_slot"]),
        lm_gid=jnp.asarray(z["feat_lm_gid"]),
        valid=jnp.asarray(z["feat_valid"]),
        # older checkpoints predate the octave field
        octave=jnp.asarray(z["feat_octave"]) if "feat_octave" in z
        else jnp.zeros(z["feat_valid"].shape, jnp.int32))
    system.status = int(meta["status"])
    system.frame_id = int(meta["frame_id"])
    system.stats.update(meta["stats"])
    system.keyframes = [
        {"gid": k["gid"], "frame_id": k["frame_id"],
         "timestamp": k["timestamp"],
         "T_cw": np.asarray(k["T_cw"], np.float32)}
        for k in meta["keyframes"]]
    system.kf_rel_edges = [
        (e["a"], e["b"], np.asarray(e["Z"], np.float32))
        for e in meta["kf_rel_edges"]]
    system.trajectory = [
        (float(t), int(f), np.asarray(T))
        for t, f, T in zip(z["trajectory_ts"], z["trajectory_fid"],
                           z["trajectory_T"])]
    if "last_img" in z:
        system.last_pyr = system.frontend.build_pyramid(
            jnp.asarray(z["last_img"]))
    else:
        system.last_pyr = None
