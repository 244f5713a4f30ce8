"""3D Gaussian Splatting .ply loader (INRIA format).

The reference's 3DGS scene is two hardcoded gaussians (SceneList.cpp:124-125);
real workloads (BASELINE.json configs 3-4: 100K-multi-million splats,
Mip-NeRF360) come as binary PLY files with per-vertex properties
  x y z nx ny nz f_dc_{0..2} f_rest_{0..44} opacity scale_{0..2} rot_{0..3}
where opacity is a logit, scales are logs, and rot is an (unnormalized)
(w,x,y,z) quaternion. Pure-NumPy parser — no plyfile dependency.
"""

from __future__ import annotations

import io
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from gsrt.core.types import GaussianCloud
from gsrt.ops.gaussian import quat_scale_to_cov3d

_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1",
    "short": "<i2", "ushort": "<u2",
    "int": "<i4", "uint": "<u4", "int32": "<i4",
}


def _parse_header(f) -> Tuple[int, List[Tuple[str, str]], str]:
    line = f.readline().strip()
    if line != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    count = 0
    props: List[Tuple[str, str]] = []
    in_vertex = False
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unterminated PLY header")
        tok = line.decode("ascii", "replace").strip().split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            in_vertex = tok[1] == "vertex"
            if in_vertex:
                count = int(tok[2])
        elif tok[0] == "property" and in_vertex:
            props.append((tok[2], _DTYPES[tok[1]]))
        elif tok[0] == "end_header":
            break
    return count, props, fmt


def load_gaussian_ply(path: str, max_sh_degree: int = 3) -> GaussianCloud:
    """Load an INRIA-format splat file into a GaussianCloud."""
    with open(path, "rb") as f:
        count, props, fmt = _parse_header(f)
        if fmt != "binary_little_endian":
            raise ValueError(f"unsupported PLY format {fmt!r}")
        dtype = np.dtype([(n, t) for n, t in props])
        raw = f.read(count * dtype.itemsize)
        data = np.frombuffer(raw, dtype=dtype)

    names = {n for n, _ in props}

    # fast path: native row decoder (all-float32 INRIA layout)
    if all(t == "<f4" for _, t in props):
        from gsrt import native
        name_idx = {n: k for k, (n, _) in enumerate(props)}
        n_rest = sum(1 for n in names if n.startswith("f_rest_"))
        if {"x", "f_dc_0", "opacity", "scale_0", "rot_0"} <= names \
                and native.available():
            degree = min(max_sh_degree,
                         int(round((1 + n_rest / 3) ** 0.5)) - 1)
            K = (degree + 1) ** 2
            parsed = native.parse_ply_rows_native(
                raw, count, len(props), name_idx["x"], name_idx["f_dc_0"],
                name_idx.get("f_rest_0", name_idx["f_dc_0"]), n_rest,
                name_idx["opacity"], name_idx["scale_0"], name_idx["rot_0"],
                K)
            if parsed is not None:
                means, sh, opacity, scales, rots = parsed
                cov3d = quat_scale_to_cov3d(jnp.asarray(rots),
                                            jnp.asarray(scales))
                return GaussianCloud(means=jnp.asarray(means), cov3d=cov3d,
                                     opacity=jnp.asarray(opacity),
                                     sh=jnp.asarray(sh))
    means = np.stack([data["x"], data["y"], data["z"]], -1).astype(np.float32)
    opacity = 1.0 / (1.0 + np.exp(-data["opacity"].astype(np.float32)))
    scales = np.exp(np.stack(
        [data[f"scale_{i}"] for i in range(3)], -1).astype(np.float32))
    rots = np.stack(
        [data[f"rot_{i}"] for i in range(4)], -1).astype(np.float32)

    n_rest = sum(1 for n in names if n.startswith("f_rest_"))
    degree = min(max_sh_degree, int(round((1 + n_rest / 3) ** 0.5)) - 1)
    K = (degree + 1) ** 2
    sh = np.zeros((count, K, 3), np.float32)
    for c in range(3):
        sh[:, 0, c] = data[f"f_dc_{c}"]
    if K > 1:
        # f_rest is channel-major: [3, 15] per splat
        rest = np.stack([data[f"f_rest_{i}"] for i in range(n_rest)],
                        -1).astype(np.float32).reshape(count, 3, n_rest // 3)
        sh[:, 1:, :] = np.transpose(rest, (0, 2, 1))[:, :K - 1, :]

    cov3d = quat_scale_to_cov3d(jnp.asarray(rots), jnp.asarray(scales))
    return GaussianCloud(means=jnp.asarray(means), cov3d=cov3d,
                         opacity=jnp.asarray(opacity), sh=jnp.asarray(sh))


def save_gaussian_ply(path: str, means, quats, scales, opacities, sh) -> None:
    """Write an INRIA-format splat file (inverse transforms applied:
    opacity→logit, scale→log)."""
    means = np.asarray(means, np.float32)
    n = means.shape[0]
    sh = np.asarray(sh, np.float32)
    K = sh.shape[1]
    n_rest = (K - 1) * 3
    props = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(n_rest)]
             + ["opacity"]
             + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    dtype = np.dtype([(p, "<f4") for p in props])
    out = np.zeros(n, dtype)
    out["x"], out["y"], out["z"] = means.T
    for c in range(3):
        out[f"f_dc_{c}"] = sh[:, 0, c]
    rest = np.transpose(sh[:, 1:, :], (0, 2, 1)).reshape(n, -1)
    for i in range(n_rest):
        out[f"f_rest_{i}"] = rest[:, i]
    op = np.clip(np.asarray(opacities, np.float32), 1e-6, 1 - 1e-6)
    out["opacity"] = np.log(op / (1 - op))
    sc = np.asarray(scales, np.float32)
    for i in range(3):
        out[f"scale_{i}"] = np.log(np.maximum(sc[:, i], 1e-12))
    q = np.asarray(quats, np.float32)
    for i in range(4):
        out[f"rot_{i}"] = q[:, i]

    header = io.BytesIO()
    header.write(b"ply\nformat binary_little_endian 1.0\n")
    header.write(f"element vertex {n}\n".encode())
    for p in props:
        header.write(f"property float {p}\n".encode())
    header.write(b"end_header\n")
    with open(path, "wb") as f:
        f.write(header.getvalue())
        f.write(out.tobytes())
