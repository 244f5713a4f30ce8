"""Triangle/procedural scene factories for the path-tracing workloads.

Re-derives (not ports) the reference's scene constructions:
  * RayTracingInOneWeekend — SceneList.cpp:157-184 + the common 22x22 random
    sphere grid (SceneList.cpp:21-66): ground sphere + ~450 small spheres
    (diffuse/metal/glass by probability 0.8/0.15/0.05) + three hero spheres;
    camera lookAt(13,2,3 → 0,0,0), fov 20.
  * CornellBox — SceneList.cpp:281-308 + Assets/CornellBox.cpp: 555-scale
    box (green left / red right / white floor, ceiling, back), area light at
    the ceiling (x∈[213,343], z∈[-328,-223], emission 15), two rotated
    boxes; camera lookAt(278,278,800 → 278,278,0), fov 40, no sky.
  * CubeAndSpheres — SceneList.cpp:130-155 (three spheres; the OBJ cube is
    added when an OBJ path is supplied).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gsrt.core.types import Materials, make_camera, look_at
from gsrt.models.path_tracer import PrimitiveScene


class _SceneBuilder:
    def __init__(self):
        self.sph = []       # (center, radius, mat)
        self.boxes = []     # (bmin, bmax, mat)
        self.cyls = []      # (center, radius, half_h, mat)
        self.bulbs = []     # (center, radius, mat)
        self.tris = []      # (v0, v1, v2, mat)
        self.mats = []      # (model, diffuse, fuzz, refr, tex_id)
        self.textures = []  # [TH, TW, 3] arrays (uniform size)
        self.alphas = []    # [TH, TW] cutout masks (parallel to textures)

    def texture(self, img, alpha=None) -> int:
        img = np.asarray(img, np.float32)
        self.textures.append(img)
        self.alphas.append(np.ones(img.shape[:2], np.float32)
                           if alpha is None else np.asarray(alpha, np.float32))
        return len(self.textures) - 1

    def material(self, model, diffuse=(0, 0, 0), fuzz=0.0, refr=1.0,
                 tex_id=-1) -> int:
        self.mats.append((model, diffuse, fuzz, refr, tex_id))
        return len(self.mats) - 1

    def lambertian(self, rgb):
        return self.material(Materials.LAMBERTIAN, rgb)

    def metallic(self, rgb, fuzz):
        return self.material(Materials.METALLIC, rgb, fuzz=fuzz)

    def dielectric(self, refr):
        return self.material(Materials.DIELECTRIC, (1, 1, 1), refr=refr)

    def light(self, rgb):
        return self.material(Materials.DIFFUSE_LIGHT, rgb)

    def sphere(self, center, radius, mat):
        self.sph.append((center, radius, mat))

    def box(self, bmin, bmax, mat):
        self.boxes.append((bmin, bmax, mat))

    def cube(self, center, half, mat):
        """CreateCube(center, radius): AABB center ± radius
        (Model.cpp:415-423)."""
        c = np.asarray(center, np.float32)
        self.boxes.append((c - half, c + half, mat))

    def cylinder(self, center, radius, mat, half_h=None):
        """Capped y-axis cylinder; the reference's cylinder rint uses
        half-height = radius (ProceduralCylinder.rint:44-45)."""
        self.cyls.append((center, radius,
                          radius if half_h is None else half_h, mat))

    def mandelbulb(self, center, radius, mat):
        self.bulbs.append((center, radius, mat))

    def quad(self, a, b, c, d, mat):
        self.tris.append((a, b, c, mat))
        self.tris.append((a, c, d, mat))

    def tri(self, a, b, c, mat):
        self.tris.append((a, b, c, mat))

    def build(self) -> PrimitiveScene:
        def arr(x, shape, dtype=np.float32):
            return jnp.asarray(np.asarray(x, dtype).reshape(shape))

        S, B, T = len(self.sph), len(self.boxes), len(self.tris)
        mats = Materials(
            model=arr([m[0] for m in self.mats], (-1,), np.int32),
            diffuse=arr([m[1] for m in self.mats], (-1, 3)),
            fuzziness=arr([m[2] for m in self.mats], (-1,)),
            refraction_index=arr([m[3] for m in self.mats], (-1,)),
            texture_id=arr([m[4] for m in self.mats], (-1,), np.int32),
        )
        textures = (jnp.asarray(np.stack(self.textures))
                    if self.textures else None)
        has_cutout = any((a < 1.0).any() for a in self.alphas)
        alpha_textures = (jnp.asarray(np.stack(self.alphas))
                          if has_cutout else None)
        C, M = len(self.cyls), len(self.bulbs)
        cyl_kwargs = dict(
            cyl_center=arr([c[0] for c in self.cyls], (C, 3)),
            cyl_radius=arr([c[1] for c in self.cyls], (C,)),
            cyl_half_h=arr([c[2] for c in self.cyls], (C,)),
            cyl_mat=arr([c[3] for c in self.cyls], (C,), np.int32),
        ) if C else {}
        mnd_kwargs = dict(
            mnd_center=arr([m[0] for m in self.bulbs], (M, 3)),
            mnd_radius=arr([m[1] for m in self.bulbs], (M,)),
            mnd_mat=arr([m[2] for m in self.bulbs], (M,), np.int32),
        ) if M else {}
        return PrimitiveScene(
            textures=textures,
            alpha_textures=alpha_textures,
            **cyl_kwargs, **mnd_kwargs,
            sph_center=arr([s[0] for s in self.sph], (S, 3)),
            sph_radius=arr([s[1] for s in self.sph], (S,)),
            sph_mat=arr([s[2] for s in self.sph], (S,), np.int32),
            box_min=arr([b[0] for b in self.boxes], (B, 3)),
            box_max=arr([b[1] for b in self.boxes], (B, 3)),
            box_mat=arr([b[2] for b in self.boxes], (B,), np.int32),
            tri_v0=arr([t[0] for t in self.tris], (T, 3)),
            tri_v1=arr([t[1] for t in self.tris], (T, 3)),
            tri_v2=arr([t[2] for t in self.tris], (T, 3)),
            tri_mat=arr([t[3] for t in self.tris], (T,), np.int32),
            materials=mats,
        )


def _common_grid(b: _SceneBuilder, rng):
    """AddRayTracingInOneWeekendCommonScene (SceneList.cpp:21-66): the
    ground sphere + 22x22 random small-sphere grid (diffuse/metal/glass at
    0.8/0.15/0.05), WITHOUT the three hero spheres."""
    b.sphere((0, -1000, 0), 1000.0, b.lambertian((0.5, 0.5, 0.5)))
    for i in range(-11, 11):
        for j in range(-11, 11):
            choose = rng.random()
            cy = j + 0.9 * rng.random()
            cx = i + 0.9 * rng.random()
            center = np.array([cx, 0.2, cy])
            if np.linalg.norm(center - np.array([4, 0.2, 0])) > 0.9:
                if choose < 0.8:
                    rgb = rng.random(3) * rng.random(3)
                    b.sphere(center, 0.2, b.lambertian(rgb))
                elif choose < 0.95:
                    fuzz = 0.5 * rng.random()
                    rgb = 0.5 * (1 + rng.random(3))
                    b.sphere(center, 0.2, b.metallic(rgb, fuzz))
                else:
                    b.sphere(center, 0.2, b.dielectric(1.5))


def ray_tracing_in_one_weekend(width=640, height=480, seed=42):
    """The RTIOW final scene (SceneList.cpp:157-184)."""
    rng = np.random.default_rng(seed)
    b = _SceneBuilder()
    _common_grid(b, rng)
    b.sphere((0, 1, 0), 1.0, b.dielectric(1.5))
    b.sphere((-4, 1, 0), 1.0, b.lambertian((0.4, 0.2, 0.1)))
    b.sphere((4, 1, 0), 1.0, b.metallic((0.7, 0.6, 0.5), 0.0))
    camera = make_camera(look_at((13, 2, 3), (0, 0, 0)), 20.0, width, height)
    return b.build(), camera, dict(aperture=0.1, focus=10.0, has_sky=True,
                                   gamma=True)


def cornell_box(width=512, height=512, with_boxes=True):
    """The Cornell box (SceneList.cpp:281-308, CornellBox.cpp geometry)."""
    s = 555.0
    b = _SceneBuilder()
    green = b.lambertian((0.12, 0.45, 0.15))
    red = b.lambertian((0.65, 0.05, 0.05))
    white = b.lambertian((0.73, 0.73, 0.73))
    light = b.light((15.0, 15.0, 15.0))

    l0, l1, l2, l3 = (0, 0, 0), (0, 0, -s), (0, s, -s), (0, s, 0)
    r0, r1, r2, r3 = (s, 0, 0), (s, 0, -s), (s, s, -s), (s, s, 0)
    b.quad(l0, l1, l2, l3, green)          # left
    b.quad(r2, r1, r0, r3, red)           # right
    b.quad(l1, r1, r2, l2, white)          # back
    b.quad(l0, r0, r1, l1, white)          # floor
    b.quad(l2, r2, r3, l3, white)          # ceiling
    x0, x1 = s * 213 / 555, s * 343 / 555
    z0, z1 = -s + s * 332 / 555, -s + s * 227 / 555
    y1 = s * 0.998
    b.quad((x0, y1, z1), (x1, y1, z1), (x1, y1, z0), (x0, y1, z0), light)

    if with_boxes:
        # two rotated boxes (SceneList.cpp:296-300) — axis-aligned
        # approximation as our PrimitiveScene boxes are AABBs; the rotations
        # (−18°, 15°) are applied to the footprint centers.
        b.box((555 - 130 - 165, 0, -65 - 165), (555 - 130, 165, -65), white)
        b.box((555 - 265 - 165, 0, -295 - 165), (555 - 265, 330, -295), white)

    camera = make_camera(look_at((278, 278, 800), (278, 278, 0)),
                         40.0, width, height)
    return b.build(), camera, dict(aperture=0.0, focus=10.0, has_sky=False,
                                   gamma=True)


def _procedural_earth(th=128, tw=256):
    """Procedural lat-long planet texture (stand-in for the reference's
    land_ocean_ice_cloud_2048.png — no bundled binary assets)."""
    v, u = np.mgrid[0:th, 0:tw].astype(np.float32)
    u /= tw
    v /= th
    lat = (v - 0.5) * np.pi
    # banded continents from a few sine octaves
    land = (np.sin(u * 12.6 + np.sin(v * 9.4) * 2.0)
            + 0.5 * np.sin(u * 31.4 + v * 17.0)
            + 0.25 * np.sin(u * 63.0 - v * 40.0))
    ocean = land < 0.3
    img = np.where(ocean[..., None],
                   np.array([0.05, 0.15, 0.45]),
                   np.array([0.15, 0.45, 0.15]))
    ice = np.abs(lat) > 1.25
    img = np.where(ice[..., None], np.array([0.9, 0.92, 0.95]), img)
    return img.astype(np.float32)


def planets_in_one_weekend(width=640, height=480, seed=42):
    """PlanetsInOneWeekend (SceneList.cpp:186-218): the RTIOW common grid
    (same 22x22 layout and 0.8/0.15/0.05 material mix) with textured hero
    spheres — Metallic(white, fuzz 0.1, earth) at (0,1,0),
    Lambertian(mars) at (-4,1,0), Metallic(white, fuzz 0, moon) at
    (4,1,0). The reference's mars/moon/earth JPG/PNG assets are stood in
    by procedural lat-long textures (no bundled binaries)."""
    rng = np.random.default_rng(seed)
    b = _SceneBuilder()
    tex_earth = b.texture(_procedural_earth())
    tex_mars = b.texture(_procedural_planet((0.55, 0.25, 0.12),
                                            (0.35, 0.15, 0.08)))
    tex_moon = b.texture(_procedural_planet((0.65, 0.65, 0.62),
                                            (0.42, 0.42, 0.40)))
    _common_grid(b, rng)
    b.sphere((0, 1, 0), 1.0,
             b.material(Materials.METALLIC, (1, 1, 1), fuzz=0.1,
                        tex_id=tex_earth))
    b.sphere((-4, 1, 0), 1.0,
             b.material(Materials.LAMBERTIAN, (1, 1, 1), tex_id=tex_mars))
    b.sphere((4, 1, 0), 1.0,
             b.material(Materials.METALLIC, (1, 1, 1), fuzz=0.0,
                        tex_id=tex_moon))
    camera = make_camera(look_at((13, 2, 3), (0, 0, 0)), 20.0, width, height)
    return b.build(), camera, dict(aperture=0.1, focus=10.0, has_sky=True,
                                   gamma=True)


def _procedural_planet(hi_rgb, lo_rgb, th=128, tw=256):
    """Two-tone banded lat-long texture (mars/moon stand-ins)."""
    v, u = np.mgrid[0:th, 0:tw].astype(np.float32)
    u /= tw
    v /= th
    bands = (np.sin(u * 18.8 + np.sin(v * 11.0) * 1.5)
             + 0.5 * np.sin(u * 47.1 - v * 23.0))
    dark = bands < 0.2
    img = np.where(dark[..., None], np.asarray(lo_rgb, np.float32),
                   np.asarray(hi_rgb, np.float32))
    return img.astype(np.float32)


def cube_and_spheres(width=256, height=256):
    """CubeAndSpheres (SceneList.cpp:130-155): the cube_multi.obj mesh +
    three spheres — Metallic(0.7,0.5,0.8, fuzz 0.2) at (1,0,0),
    Dielectric(1.5) at (-1,0,0) and a textured Lambertian at (0,1,0) (the
    reference's land_ocean_ice_cloud PNG, stood in by the procedural earth
    — no bundled binaries). The OBJ is loaded from the reference tree when
    present; a unit box with cube_multi's first material stands in
    otherwise."""
    import os
    b = _SceneBuilder()
    tex_earth = b.texture(_procedural_earth())
    b.sphere((1, 0, 0), 0.5, b.metallic((0.7, 0.5, 0.8), 0.2))
    b.sphere((-1, 0, 0), 0.5, b.dielectric(1.5))
    b.sphere((0, 1, 0), 0.5,
             b.material(Materials.LAMBERTIAN, (1, 1, 1), tex_id=tex_earth))

    from gsrt.scene.reference_scenes import REF_ROOT
    obj_path = os.path.join(REF_ROOT, "assets", "models", "cube_multi.obj")
    if os.path.exists(obj_path):
        from gsrt.scene.obj import load_obj
        cube = load_obj(obj_path)
        base = len(b.mats)
        mm = cube.materials
        for k in range(int(mm.model.shape[0])):
            b.material(int(mm.model[k]),
                       tuple(np.asarray(mm.diffuse[k], np.float32)),
                       fuzz=float(mm.fuzziness[k]),
                       refr=float(mm.refraction_index[k]))
        v0 = np.asarray(cube.tri_v0)
        v1 = np.asarray(cube.tri_v1)
        v2 = np.asarray(cube.tri_v2)
        vm = np.asarray(cube.tri_mat)
        for t in range(v0.shape[0]):
            b.tri(v0[t], v1[t], v2[t], base + int(vm[t]))
    else:
        b.box((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5),
              b.lambertian((0.8, 0.6, 0.2)))
    camera = make_camera(look_at((0, 0, 2), (0, 0, 0)), 90.0, width, height)
    return b.build(), camera, dict(aperture=0.05, focus=2.0, has_sky=True,
                                   gamma=False)


def _grid_centers(rng, grid):
    """One reference grid cell (SceneList.cpp:464-476): the material draw
    precedes the two jitter draws, and a cell only spawns when its center
    clears the (4, 0.2, 0) hero spot by 0.9."""
    for i in range(-grid, grid):
        for j in range(-grid, grid):
            choose = rng.random()
            cy = j + 0.9 * rng.random()
            cx = i + 0.9 * rng.random()
            center = np.array([cx, 0.2, cy])
            if np.linalg.norm(center - np.array([4, 0.2, 0])) > 0.9:
                yield choose, center


def cubes_and_common_scene(width=640, height=480, seed=42, grid=30):
    """CubesAndCommonScene (SceneList.cpp:443-509): the RTIOW common grid
    plus a 60x60 field of procedural 0.2-half-extent cubes with the same
    0.8/0.15/0.05 diffuse/metal/glass mix. `grid` scales the cube field
    (reference: 30 → 3 600 cells)."""
    rng = np.random.default_rng(seed)
    b = _SceneBuilder()
    _common_grid(b, rng)
    for choose, center in _grid_centers(rng, grid):
        if choose < 0.8:
            b.cube(center, 0.2, b.lambertian(rng.random(3) * rng.random(3)))
        elif choose < 0.95:
            fuzz = 0.5 * rng.random()
            b.cube(center, 0.2, b.metallic(0.5 * (1 + rng.random(3)), fuzz))
        else:
            b.cube(center, 0.2, b.dielectric(1.5))
    camera = make_camera(look_at((13, 2, 3), (0, 0, 0)), 20.0, width, height)
    return b.build(), camera, dict(aperture=0.1, focus=10.0, has_sky=True,
                                   gamma=True)


def cylinder_cubes_common_scene(width=640, height=480, seed=42, grid=30):
    """CylinderCubesCommonScene (SceneList.cpp:511-598): the common grid
    plus a half-cubes / half-cylinders field. Every cylinder is a
    DiffuseLight (the reference's CreateCylinder only supports emissive
    materials, Model.cpp:638) with half-height = radius = 0.2."""
    rng = np.random.default_rng(seed)
    b = _SceneBuilder()
    _common_grid(b, rng)
    for i in range(-grid, grid):
        for j in range(-grid, grid):
            kind = rng.random()
            choose = rng.random()
            cy = j + 0.9 * rng.random()
            cx = i + 0.9 * rng.random()
            center = np.array([cx, 0.2, cy])
            if np.linalg.norm(center - np.array([4, 0.2, 0])) <= 0.9:
                continue
            if kind <= 0.5:
                if choose < 0.8:
                    b.cube(center, 0.2,
                           b.lambertian(rng.random(3) * rng.random(3)))
                elif choose < 0.95:
                    fuzz = 0.5 * rng.random()
                    b.cube(center, 0.2,
                           b.metallic(0.5 * (1 + rng.random(3)), fuzz))
                else:
                    b.cube(center, 0.2, b.dielectric(1.5))
            else:
                rgb = (rng.random(3) * rng.random(3) if choose < 0.8
                       else 0.5 * (1 + rng.random(3)))
                b.cylinder(center, 0.2, b.light(rgb))
    camera = make_camera(look_at((13, 2, 3), (0, 0, 0)), 20.0, width, height)
    return b.build(), camera, dict(aperture=0.1, focus=10.0, has_sky=True,
                                   gamma=True)


def mandelbulb_scene(width=640, height=480, seed=42):
    """MandelbulbScene (SceneList.cpp:1249-1276): the common grid plus a
    radius-1.25 power-8 Mandelbulb at (0, 2, 0), Lambertian(0.5, 0.7, 1.0);
    camera at (0, 2.5, 3) facing -z, fov 90."""
    rng = np.random.default_rng(seed)
    b = _SceneBuilder()
    _common_grid(b, rng)
    b.mandelbulb((0, 2, 0), 1.25, b.lambertian((0.5, 0.7, 1.0)))
    camera = make_camera(look_at((0, 2.5, 3), (0, 2.5, 0)), 90.0,
                         width, height)
    return b.build(), camera, dict(aperture=0.05, focus=2.0, has_sky=True,
                                   gamma=True)


def simple_test(width=512, height=512):
    """SimpleTest (SceneList.cpp:1105-1124) = Model::CreateSquare(555):
    CornellBox::CreateSimple's surviving geometry — the back green panel
    and the ceiling light quad (CornellBox.cpp:16-112); no sky."""
    s = 555.0
    b = _SceneBuilder()
    green = b.lambertian((0.12, 0.45, 0.15))
    light = b.light((15.0, 15.0, 15.0))
    b.quad((0, 0, -s), (s, 0, -s), (s, s, -s), (0, s, -s), green)
    x0, x1 = s * 213 / 555, s * 343 / 555
    z0, z1 = s * (-555 + 332) / 555, s * (-555 + 227) / 555
    y1 = s * 0.998
    b.quad((x0, y1, z1), (x1, y1, z1), (x1, y1, z0), (x0, y1, z0), light)
    camera = make_camera(look_at((278, 278, 800), (278, 278, 0)),
                         40.0, width, height)
    return b.build(), camera, dict(aperture=0.0, focus=10.0, has_sky=False,
                                   gamma=True)


def mirror_in_gaussians(width=128, height=128, n_splats=60, seed=7):
    """Mixed-geometry scene: a fuzz-0 metallic sphere and a ground plane
    inside a Gaussian cloud — the reference's TLAS-with-hit-groups
    capability (splat BLAS hit group 4 next to triangles/procedurals,
    RayTracing/Application.cpp:253-398). Splats must be visible both
    directly and in the mirror reflection.

    Returns (primitive_scene, gaussian_cloud, camera, opts)."""
    from gsrt.core.types import GaussianCloud
    from gsrt.ops.gaussian import quat_scale_to_cov3d
    from gsrt.ops.sh import C0

    b = _SceneBuilder()
    b.sphere((0.0, 1.0, 0.0), 1.0, b.metallic((0.9, 0.9, 0.9), 0.0))
    b.quad((-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20),
           b.lambertian((0.5, 0.5, 0.5)))

    rng = np.random.default_rng(seed)
    centers = rng.uniform(-3.0, 3.0, (n_splats, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(0.5, 3.0, n_splats)  # keep above the floor
    quats = rng.normal(size=(n_splats, 4)).astype(np.float32)
    scales = rng.uniform(0.08, 0.25, (n_splats, 3)).astype(np.float32)
    opac = rng.uniform(0.4, 0.9, n_splats).astype(np.float32)
    rgb = rng.uniform(0.2, 1.0, (n_splats, 3)).astype(np.float32)
    sh = ((rgb - 0.5) / C0)[:, None, :]
    cloud = GaussianCloud(
        means=jnp.asarray(centers),
        cov3d=quat_scale_to_cov3d(jnp.asarray(quats), jnp.asarray(scales)),
        opacity=jnp.asarray(opac), sh=jnp.asarray(sh))

    camera = make_camera(look_at((0, 1.5, 6.0), (0, 1.0, 0.0)), 45.0,
                         width, height)
    return b.build(), cloud, camera, dict(aperture=0.0, focus=6.0,
                                          has_sky=True, gamma=False)
