"""Wavefront OBJ (+MTL) loader for the triangle workloads.

Covers the subset the reference's tinyobjloader path uses
(Assets/Model.cpp LoadModel): v / vt / vn / f with polygon fan
triangulation, usemtl/mtllib with Kd (diffuse), Ke (emission), Ns/illum
heuristics mapped onto the 4 material models of Scatter.glsl, plus
map_Kd diffuse textures and map_d alpha-cutout masks (the texcoords and
texture samplers the reference binds in Scatter.glsl:18 and samples in
TraceTree.rahit for foliage masking).

Textures are decoded with PIL and resampled into a fixed-resolution atlas
([NT, TEX_RES, TEX_RES, 3] + alpha [NT, TEX_RES, TEX_RES]) so the sampler
stays a single dense gather (gsrt.models.path_tracer.sample_texture).

`load_obj_dir` merges every OBJ in a directory into one PrimitiveScene —
the reference's directory-scene factories (SceneList.cpp:626-738) — with
optional per-file material overrides and a uniform scale.
"""

from __future__ import annotations

import fnmatch
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from gsrt.core.types import Materials
from gsrt.models.path_tracer import PrimitiveScene

TEX_RES = 256


def _parse_mtl(path: str) -> Dict[str, dict]:
    mats: Dict[str, dict] = {}
    cur: Optional[dict] = None
    if not os.path.exists(path):
        return mats
    base = os.path.dirname(path)
    with open(path, "r", errors="replace") as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "newmtl":
                cur = mats.setdefault(tok[1], {"kd": (0.7, 0.7, 0.7),
                                               "ke": (0, 0, 0),
                                               "ns": 0.0, "ni": 1.0,
                                               "illum": 2,
                                               "map_kd": None,
                                               "map_d": None})
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
            elif tok[0] == "map_Kd":
                cur["map_kd"] = os.path.join(base, " ".join(tok[1:]))
            elif tok[0] == "map_d":
                cur["map_d"] = os.path.join(base, " ".join(tok[1:]))
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


class _TextureAtlas:
    """Deduplicating fixed-resolution texture atlas (stb_image analogue)."""

    def __init__(self):
        self.ids: Dict[str, int] = {}
        self.rgb: List[np.ndarray] = []
        self.alpha: List[np.ndarray] = []

    def add(self, rgb_path: Optional[str],
            alpha_path: Optional[str]) -> int:
        if rgb_path is None and alpha_path is None:
            return -1
        key = f"{rgb_path}|{alpha_path}"
        if key in self.ids:
            return self.ids[key]
        rgb, alpha = _load_image(rgb_path), None
        if alpha_path is not None:
            a = _load_image(alpha_path, gray=True)
            alpha = a if a is not None else None
        if rgb is None and alpha is None:
            return -1
        if rgb is None:
            rgb = np.ones((TEX_RES, TEX_RES, 3), np.float32)
        if alpha is None:
            alpha = np.ones((TEX_RES, TEX_RES), np.float32)
        tid = len(self.rgb)
        self.ids[key] = tid
        self.rgb.append(rgb)
        self.alpha.append(alpha)
        return tid

    def arrays(self):
        if not self.rgb:
            return None, None
        has_alpha = any((a < 1.0).any() for a in self.alpha)
        return (jnp.asarray(np.stack(self.rgb)),
                jnp.asarray(np.stack(self.alpha)) if has_alpha else None)


def _load_image(path: Optional[str], gray: bool = False):
    if path is None or not os.path.exists(path):
        return None
    try:
        from PIL import Image
        img = Image.open(path)
        # map_d masks often live in the diffuse PNG's alpha channel
        if gray:
            img = img.convert("RGBA").getchannel("A") \
                if "A" in img.getbands() else img.convert("L")
        else:
            img = img.convert("RGB")
        img = img.resize((TEX_RES, TEX_RES))
        a = np.asarray(img, np.float32) / 255.0
        # OBJ v-coordinate origin is bottom-left; images are top-down
        return a[::-1]
    except Exception:
        return None


def _empty_scene_arrays():
    empty3 = jnp.zeros((0, 3), jnp.float32)
    empty1 = jnp.zeros((0,), jnp.float32)
    empty_i = jnp.zeros((0,), jnp.int32)
    return empty3, empty1, empty_i


def _parse_obj(path: str, atlas: _TextureAtlas, mat_rows: List[tuple],
               tex_ids: List[int], mat_override: Optional[tuple] = None):
    """Parse one OBJ into (verts, uvs, tris[(i0,i1,i2,t0,t1,t2,mat)])
    interning materials into the shared tables."""
    verts: List[tuple] = []
    uvs: List[tuple] = [(0.0, 0.0)]
    tris: List[tuple] = []
    mtl: Dict[str, dict] = {}
    local_ids: Dict[str, int] = {}

    def intern(name: str) -> int:
        if name not in local_ids:
            if mat_override is not None:
                model, kd, fuzz, ni = mat_override
                tid = -1
            else:
                m = mtl.get(name, {"kd": (0.7, 0.7, 0.7), "ke": (0, 0, 0),
                                   "ns": 0.0, "ni": 1.0, "illum": 2,
                                   "map_kd": None, "map_d": None})
                model, kd, fuzz, ni = _material_model(m)
                tid = atlas.add(m.get("map_kd"), m.get("map_d"))
            local_ids[name] = len(mat_rows)
            mat_rows.append((model, kd, fuzz, ni))
            tex_ids.append(tid)
        return local_ids[name]

    cur_mat = intern("__default__")
    base = os.path.dirname(path)
    with open(path, "r", errors="replace") as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v":
                verts.append(tuple(float(x) for x in tok[1:4]))
            elif tok[0] == "vt":
                u = float(tok[1])
                v = float(tok[2]) if len(tok) > 2 else 0.0
                uvs.append((u, v))
            elif tok[0] == "mtllib":
                mtl.update(_parse_mtl(os.path.join(base, " ".join(tok[1:]))))
            elif tok[0] == "usemtl":
                # reference data contains BARE `usemtl` lines with no name
                # (Blender_2.83/_scaffold_000.obj, Blender_2.91/Mesh_001.obj)
                # — tinyobjloader reads an empty name there; treat it as
                # the default material instead of crashing
                cur_mat = intern(tok[1] if len(tok) > 1 else "__default__")
            elif tok[0] == "f":
                vi, ti = [], []
                for t in tok[1:]:
                    parts = t.split("/")
                    i = int(parts[0])
                    vi.append(i - 1 if i > 0 else len(verts) + i)
                    if len(parts) > 1 and parts[1]:
                        j = int(parts[1])
                        ti.append(j if j > 0 else len(uvs) + j)
                    else:
                        ti.append(0)
                for k in range(1, len(vi) - 1):  # fan triangulation
                    tris.append((vi[0], vi[k], vi[k + 1],
                                 ti[0], ti[k], ti[k + 1], cur_mat))
    return verts, uvs, tris


def _assemble(all_parts, mat_rows, tex_ids, atlas, transform):
    v_list, uv_list, t_list = [], [], []
    v_off = 0
    uv_off = 0
    # a part's uvs list always holds its index-0 sentinel; real texcoords
    # mean len > 1. The shifted sentinel indices of later parts are > 0,
    # so the t[:, 3:6] > 0 test alone would false-positive.
    any_real_uv = any(len(uvs) > 1 for _, uvs, _ in all_parts)
    for verts, uvs, tris in all_parts:
        v_list.append(np.asarray(verts, np.float32).reshape(-1, 3))
        uv_list.append(np.asarray(uvs, np.float32).reshape(-1, 2))
        t = np.asarray(tris, np.int64).reshape(-1, 7)
        t[:, :3] += v_off
        t[:, 3:6] += uv_off
        t_list.append(t)
        v_off += len(verts)
        uv_off += len(uvs)
    v = np.concatenate(v_list) if v_list else np.zeros((0, 3), np.float32)
    uv = np.concatenate(uv_list) if uv_list else np.zeros((1, 2), np.float32)
    t = np.concatenate(t_list) if t_list else np.zeros((0, 7), np.int64)

    if transform is not None:
        v = v @ np.asarray(transform[:3, :3], np.float32).T + \
            np.asarray(transform[:3, 3], np.float32)

    textures, alpha_tex = atlas.arrays()
    any_tex = any(t >= 0 for t in tex_ids)
    mats = Materials(
        model=jnp.asarray([m[0] for m in mat_rows], jnp.int32),
        diffuse=jnp.asarray([m[1] for m in mat_rows], jnp.float32),
        fuzziness=jnp.asarray([m[2] for m in mat_rows], jnp.float32),
        refraction_index=jnp.asarray([m[3] for m in mat_rows], jnp.float32),
        texture_id=(jnp.asarray(tex_ids, jnp.int32)
                    if any_tex and textures is not None else None),
    )
    empty3, empty1, empty_i = _empty_scene_arrays()
    has_uv = any_real_uv and len(t) > 0
    uvs3 = [jnp.asarray(uv[t[:, 3 + i]]) for i in range(3)] \
        if has_uv else [None, None, None]
    return PrimitiveScene(
        sph_center=empty3, sph_radius=empty1, sph_mat=empty_i,
        box_min=empty3, box_max=empty3, box_mat=empty_i,
        tri_v0=jnp.asarray(v[t[:, 0]]), tri_v1=jnp.asarray(v[t[:, 1]]),
        tri_v2=jnp.asarray(v[t[:, 2]]),
        tri_mat=jnp.asarray(t[:, 6], jnp.int32),
        materials=mats,
        textures=textures if mats.texture_id is not None else None,
        alpha_textures=(alpha_tex if mats.texture_id is not None else None),
        tri_uv0=uvs3[0], tri_uv1=uvs3[1], tri_uv2=uvs3[2],
    )


def load_obj(path: str, transform: Optional[np.ndarray] = None
             ) -> PrimitiveScene:
    """Load one OBJ file into a triangle-only PrimitiveScene (with
    texcoords + map_Kd/map_d textures when present)."""
    atlas = _TextureAtlas()
    mat_rows: List[tuple] = []
    tex_ids: List[int] = []
    part = _parse_obj(path, atlas, mat_rows, tex_ids)
    return _assemble([part], mat_rows, tex_ids, atlas, transform)


def load_obj_dir(path: str, transform: Optional[np.ndarray] = None,
                 overrides: Sequence[Tuple[str, tuple]] = (),
                 max_files: Optional[int] = None) -> PrimitiveScene:
    """Merge every `*.obj` under `path` into one PrimitiveScene — the
    reference's directory-scene factories (SceneList.cpp:626-738).

    overrides: [(filename glob, (model, kd, fuzz, ni))] applied per file
    (SetAllMaterial analogue, e.g. TreesAndGrass foliage rules); a rule
    value of None SKIPS the file entirely (the reference's `continue`
    exclusions, e.g. blender_2_80's Dirt_grass*). First matching rule
    wins, so order follows the reference's if/else chains.
    """
    files = sorted(f for f in os.listdir(path) if f.endswith(".obj"))
    if max_files is not None:
        files = files[:max_files]
    atlas = _TextureAtlas()
    mat_rows: List[tuple] = []
    tex_ids: List[int] = []
    parts = []
    for fn in files:
        ov = None
        skip = False
        for pat, mat in overrides:
            if fnmatch.fnmatch(fn, pat) or pat in fn:
                if mat is None:
                    skip = True
                else:
                    ov = mat
                break
        if skip:
            continue
        parts.append(_parse_obj(os.path.join(path, fn), atlas, mat_rows,
                                tex_ids, mat_override=ov))
    return _assemble(parts, mat_rows, tex_ids, atlas, transform)


def load_camera_file(path: str):
    """Reference .camera file: 6 floats — eye xyz, center xyz
    (SceneList.cpp:705-714). Returns (eye, center)."""
    with open(path) as f:
        vals = [float(x) for x in f.read().split()[:6]]
    return tuple(vals[:3]), tuple(vals[3:])
