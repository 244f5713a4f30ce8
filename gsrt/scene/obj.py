"""Minimal Wavefront OBJ (+MTL) loader for the triangle workloads.

Covers the subset the reference's tinyobjloader path uses
(Assets/Model.cpp LoadModel): v / vn / f with polygon fan triangulation,
usemtl/mtllib with Kd (diffuse), Ke (emission), Ns/illum heuristics mapped
onto the 4 material models of Scatter.glsl.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from gsrt.core.types import Materials
from gsrt.models.path_tracer import PrimitiveScene


def _parse_mtl(path: str) -> Dict[str, dict]:
    mats: Dict[str, dict] = {}
    cur: Optional[dict] = None
    if not os.path.exists(path):
        return mats
    with open(path, "r", errors="replace") as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "newmtl":
                cur = mats.setdefault(tok[1], {"kd": (0.7, 0.7, 0.7),
                                               "ke": (0, 0, 0),
                                               "ns": 0.0, "ni": 1.0,
                                               "illum": 2})
            elif cur is None:
                continue
            elif tok[0] == "Kd":
                cur["kd"] = tuple(float(x) for x in tok[1:4])
            elif tok[0] == "Ke":
                cur["ke"] = tuple(float(x) for x in tok[1:4])
            elif tok[0] == "Ns":
                cur["ns"] = float(tok[1])
            elif tok[0] == "Ni":
                cur["ni"] = float(tok[1])
            elif tok[0] == "illum":
                cur["illum"] = int(tok[1])
    return mats


def _material_model(m: dict):
    """Heuristic MTL → RTIOW material mapping (Model.cpp does similar with
    tinyobj fields)."""
    if any(c > 0 for c in m["ke"]):
        return Materials.DIFFUSE_LIGHT, m["ke"], 0.0, 1.0
    if m["illum"] >= 7 or (m["ni"] > 1.01 and m["illum"] >= 4):
        return Materials.DIELECTRIC, (1, 1, 1), 0.0, m["ni"]
    if m["illum"] >= 3 and m["ns"] > 200:
        fuzz = max(0.0, 1.0 - min(m["ns"], 1000.0) / 1000.0)
        return Materials.METALLIC, m["kd"], fuzz, 1.0
    return Materials.LAMBERTIAN, m["kd"], 0.0, 1.0


def load_obj(path: str, transform: Optional[np.ndarray] = None
             ) -> PrimitiveScene:
    """Load an OBJ file into a triangle-only PrimitiveScene."""
    verts: List[tuple] = []
    tris: List[tuple] = []       # (i0, i1, i2, mat_id)
    mtl: Dict[str, dict] = {}
    mat_ids: Dict[str, int] = {}
    mat_rows: List[tuple] = []
    cur_mat = 0

    def intern(name: str) -> int:
        if name not in mat_ids:
            m = mtl.get(name, {"kd": (0.7, 0.7, 0.7), "ke": (0, 0, 0),
                               "ns": 0.0, "ni": 1.0, "illum": 2})
            mat_ids[name] = len(mat_rows)
            mat_rows.append(_material_model(m))
        return mat_ids[name]

    cur_mat = intern("__default__")
    base = os.path.dirname(path)
    with open(path, "r", errors="replace") as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v":
                verts.append(tuple(float(x) for x in tok[1:4]))
            elif tok[0] == "mtllib":
                mtl.update(_parse_mtl(os.path.join(base, tok[1])))
            elif tok[0] == "usemtl":
                cur_mat = intern(tok[1])
            elif tok[0] == "f":
                idx = []
                for t in tok[1:]:
                    i = int(t.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tris.append((idx[0], idx[k], idx[k + 1], cur_mat))

    v = np.asarray(verts, np.float32)
    if transform is not None:
        v = v @ np.asarray(transform[:3, :3], np.float32).T + \
            np.asarray(transform[:3, 3], np.float32)
    t = np.asarray(tris, np.int64).reshape(-1, 4)

    mats = Materials(
        model=jnp.asarray([m[0] for m in mat_rows], jnp.int32),
        diffuse=jnp.asarray([m[1] for m in mat_rows], jnp.float32),
        fuzziness=jnp.asarray([m[2] for m in mat_rows], jnp.float32),
        refraction_index=jnp.asarray([m[3] for m in mat_rows], jnp.float32),
    )
    empty3 = jnp.zeros((0, 3), jnp.float32)
    empty1 = jnp.zeros((0,), jnp.float32)
    empty_i = jnp.zeros((0,), jnp.int32)
    return PrimitiveScene(
        sph_center=empty3, sph_radius=empty1, sph_mat=empty_i,
        box_min=empty3, box_max=empty3, box_mat=empty_i,
        tri_v0=jnp.asarray(v[t[:, 0]]), tri_v1=jnp.asarray(v[t[:, 1]]),
        tri_v2=jnp.asarray(v[t[:, 2]]),
        tri_mat=jnp.asarray(t[:, 3], jnp.int32),
        materials=mats,
    )


def load_camera_file(path: str):
    """Reference .camera file: 6 floats — eye xyz, center xyz
    (SceneList.cpp:705-714). Returns (eye, center)."""
    with open(path) as f:
        vals = [float(x) for x in f.read().split()[:6]]
    return tuple(vals[:3]), tuple(vals[3:])
