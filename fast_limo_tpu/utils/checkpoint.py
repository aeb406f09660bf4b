"""Checkpoint / resume of the full SLAM state.

The reference has NO persistence — a crash loses the map (SURVEY.md §5), and
its relocalization branch expects saved `.pcd` maps.  Here the entire
device-resident `LIOState` pytree (filter mean/covariance + voxel-hash map +
carries) serializes to a single compressed ``.npz``; `save_map_pcd` exports
the occupied map points in ASCII PCD for interop with PCL-world tooling.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_state(path: str, state, extra: Optional[dict] = None) -> None:
    """Serialize a LIOState (or any pytree of arrays) to ``path`` (.npz)."""
    arrays, _ = _flatten_with_paths(state)
    meta = {"keys": sorted(arrays.keys()), "extra": extra or {}}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(meta),
                        **{k.replace("/", "__"): v for k, v in arrays.items()})


def load_host_arrays(path: str, template):
    """Restore into the structure of ``template`` as HOST (numpy) arrays.

    Used directly by the multi-process restore path
    (parallel/distributed.load_checkpoint), where leaves must stay on host
    until `device_put` scatters them onto the global mesh."""
    data = np.load(path, allow_pickle=False)
    arrays = {k.replace("__", "/"): data[k] for k in data.files if k != "__meta__"}
    flat, _ = _flatten_with_paths(template)          # insertion order == tree order
    _, tdef = jax.tree_util.tree_flatten(template)
    rebuilt = []
    for key, want in flat.items():
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key}")
        got = arrays[key]
        if tuple(got.shape) != tuple(want.shape):
            raise ValueError(f"shape mismatch for {key}: {got.shape} vs {want.shape}")
        rebuilt.append(np.asarray(got, want.dtype))
    return jax.tree_util.tree_unflatten(tdef, rebuilt)


def load_state(path: str, template):
    """Restore into the structure of ``template`` (same pytree shape/dtypes)."""
    return jax.tree_util.tree_map(jnp.asarray, load_host_arrays(path, template))


def load_extra(path: str) -> dict:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    return meta.get("extra", {})


def map_points(map_state) -> np.ndarray:
    """Extract the occupied (n,3) world points from a VoxelHashMap."""
    counts = np.asarray(map_state.counts)
    pts = np.asarray(map_state.points)
    out = []
    occ = np.nonzero(counts > 0)[0]
    for s in occ:
        out.append(pts[s, : counts[s]])
    return np.concatenate(out) if out else np.zeros((0, 3), np.float32)


def save_map_pcd(path: str, map_state) -> int:
    """ASCII PCD export (relocation-branch interop, README.md:209-215)."""
    pts = map_points(map_state)
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\n"
                "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                f"COUNT 1 1 1\nWIDTH {len(pts)}\nHEIGHT 1\n"
                "VIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {len(pts)}\nDATA ascii\n")
        for p in pts:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
    return len(pts)


def load_map_pcd(path: str) -> np.ndarray:
    pts = []
    with open(path) as f:
        in_data = False
        for line in f:
            if in_data:
                xs = line.split()
                if len(xs) >= 3:
                    pts.append([float(xs[0]), float(xs[1]), float(xs[2])])
            elif line.startswith("DATA"):
                if "ascii" not in line:
                    raise ValueError("only ascii PCD supported")
                in_data = True
    return np.asarray(pts, np.float32).reshape(-1, 3)
