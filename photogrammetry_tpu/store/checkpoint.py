"""Checkpoint/resume of incremental SfM state.

The reference's only resume story is caching expensive intermediates
(SURVEY.md §5); the north star needs true checkpoint-restart of the
estimator: poses, landmarks and the track table snapshot atomically per
keyframe so a run can resume mid-sequence.  Format: a single .npz written
via a temp file + rename (atomic on POSIX), plus a JSON sidecar of metadata.
"""
from __future__ import annotations

import json
import os

import numpy as np

from photogrammetry_tpu.sfm.tracks import TrackTable

_FIELDS = ("obs", "obs_mask", "points", "has_point", "kp_track",
           "num_tracks", "dropped")


def save_checkpoint(path: str, rs, ts, table: TrackTable,
                    frame_index: int, metadata: dict | None = None) -> None:
    arrays = {
        "rs": np.asarray(rs), "ts": np.asarray(ts),
        "frame_index": np.asarray(frame_index, np.int32),
    }
    for f in _FIELDS:
        arrays[f"table_{f}"] = np.asarray(getattr(table, f))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **arrays)
    os.replace(tmp, path)
    if metadata is not None:
        with open(path + ".json", "w") as fh:
            json.dump(metadata, fh)


def load_checkpoint(path: str):
    """Returns (rs, ts, TrackTable, frame_index, metadata|None)."""
    import jax.numpy as jnp

    data = np.load(path)
    table = TrackTable(**{f: jnp.asarray(data[f"table_{f}"])
                          for f in _FIELDS})
    meta = None
    if os.path.isfile(path + ".json"):
        with open(path + ".json") as fh:
            meta = json.load(fh)
    return (jnp.asarray(data["rs"]), jnp.asarray(data["ts"]), table,
            int(data["frame_index"]), meta)
