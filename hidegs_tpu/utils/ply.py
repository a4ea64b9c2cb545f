"""Minimal PLY IO + the 3DGS gaussian attribute layout.

plyfile is not in the environment, so this is a self-contained
binary_little_endian reader/writer covering what we need: float32 vertex
properties (+uchar colors for point clouds). The gaussian attribute layout
matches the reference exactly (save_ply, scene/gaussian_model.py:473-540):
x y z nx ny nz f_dc_0..2 f_rest_0..44 opacity scale_0..2 rot_0..3 — so
checkpoints interchange with the reference toolchain and its viewers.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

_DTYPES = {
    "float": np.float32,
    "float32": np.float32,
    "double": np.float64,
    "float64": np.float64,
    "uchar": np.uint8,
    "uint8": np.uint8,
    "char": np.int8,
    "short": np.int16,
    "ushort": np.uint16,
    "int": np.int32,
    "int32": np.int32,
    "uint": np.uint32,
}


def write_ply(path: str, properties: Dict[str, np.ndarray]):
    """Write one 'vertex' element with named properties (all same length)."""
    names = list(properties.keys())
    n = len(next(iter(properties.values())))
    dtype = np.dtype(
        [(name, np.asarray(properties[name]).dtype.newbyteorder("<")) for name in names]
    )
    data = np.empty(n, dtype=dtype)
    for name in names:
        data[name] = np.asarray(properties[name])
    typemap = {np.dtype(np.float32): "float", np.dtype(np.float64): "double",
               np.dtype(np.uint8): "uchar", np.dtype(np.int32): "int"}
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        for name in names:
            t = typemap[np.dtype(np.asarray(properties[name]).dtype)]
            f.write(f"property {t} {name}\n".encode())
        f.write(b"end_header\n")
        data.tofile(f)


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read the 'vertex' element of a binary or ascii PLY into {name: array}."""
    with open(path, "rb") as f:
        header: List[bytes] = []
        while True:
            line = f.readline()
            header.append(line)
            if line.strip() == b"end_header":
                break
        fmt = "binary_little_endian"
        n = 0
        props: List[Tuple[str, np.dtype]] = []
        in_vertex = False
        for line in header:
            parts = line.decode("ascii", "ignore").split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n = int(parts[2])
            elif parts[0] == "property" and in_vertex:
                if parts[1] == "list":
                    raise ValueError("list properties unsupported")
                props.append((parts[2], np.dtype(_DTYPES[parts[1]])))
        if fmt == "ascii":
            raw = np.loadtxt(f, max_rows=n)
            raw = raw.reshape(n, len(props))
            return {name: raw[:, i].astype(dt) for i, (name, dt) in enumerate(props)}
        dtype = np.dtype([(name, dt.newbyteorder("<")) for name, dt in props])
        data = np.fromfile(f, dtype=dtype, count=n)
    return {name: np.ascontiguousarray(data[name]) for name, _ in props}


# ---------------------------------------------------------------- 3DGS layout


def gaussian_properties(xyz, sh_dc, sh_rest, opacity_logit, log_scale, rotation):
    """Assemble the reference's ply attribute dict from raw (pre-activation)
    parameters. sh_dc (N,3); sh_rest (N,15,3); others as stored."""
    n = len(xyz)
    props = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": np.zeros(n, np.float32), "ny": np.zeros(n, np.float32),
        "nz": np.zeros(n, np.float32),
    }
    for c in range(3):
        props[f"f_dc_{c}"] = sh_dc[:, c]
    # reference stores f_rest channel-major: (3, 15) flattened per point
    rest = np.transpose(sh_rest, (0, 2, 1)).reshape(n, -1)  # (N, 45)
    for i in range(rest.shape[1]):
        props[f"f_rest_{i}"] = rest[:, i]
    props["opacity"] = opacity_logit
    for i in range(3):
        props[f"scale_{i}"] = log_scale[:, i]
    for i in range(4):
        props[f"rot_{i}"] = rotation[:, i]
    return {k: np.asarray(v, np.float32) for k, v in props.items()}


def save_gaussian_ply(path: str, state) -> None:
    """Save alive gaussians of a GaussianState in reference 3DGS ply format."""
    alive = np.asarray(state.alive)
    p = state.params
    props = gaussian_properties(
        np.asarray(p.xyz)[alive],
        np.asarray(p.sh_dc)[alive],
        np.asarray(p.sh_rest)[alive],
        np.asarray(p.opacity)[alive],
        np.asarray(p.scaling)[alive],
        np.asarray(p.rotation)[alive],
    )
    write_ply(path, props)


def load_gaussian_arrays(path: str):
    """Read a 3DGS ply → dict of raw parameter arrays (numpy)."""
    d = read_ply(path)
    n = len(d["x"])
    xyz = np.stack([d["x"], d["y"], d["z"]], axis=-1)
    sh_dc = np.stack([d[f"f_dc_{c}"] for c in range(3)], axis=-1)
    rest_names = sorted(
        (k for k in d if k.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    if rest_names:
        rest = np.stack([d[k] for k in rest_names], axis=-1).reshape(n, 3, -1)
        sh_rest = np.transpose(rest, (0, 2, 1))
    else:
        sh_rest = np.zeros((n, 15, 3), np.float32)
    scaling = np.stack([d[f"scale_{i}"] for i in range(3)], axis=-1)
    rotation = np.stack([d[f"rot_{i}"] for i in range(4)], axis=-1)
    return {
        "xyz": xyz,
        "sh_dc": sh_dc,
        "sh_rest": sh_rest,
        "opacity": d["opacity"],
        "scaling": scaling,
        "rotation": rotation,
    }
