"""JSON scene files — a declarative front end for the scene-builder API.

The reference hard-codes its scene in host code (ref: src/lib.rs:220-447,
there is no scene file format anywhere in the repo); tpurt's Python
builder API (tpurt.scene) is the primary interface, and this module adds
a serializable form on top of it so scenes can be shipped, diffed, and
loaded from the CLI (viewer.py --scene-file) without writing Python.

Schema (all vectors are 3-lists, all fields of each record shown):

    {
      "materials": [
        {"type": "diffuse",    "color": [r,g,b], "roughness": 0.0},
        {"type": "dielectric", "ior": 1.5,       "roughness": 0.01},
        {"type": "metal",      "color": [r,g,b], "roughness": 0.1},
        {"type": "emissive",   "color": [r,g,b], "intensity": 10.0}
      ],
      "spheres": [
        {"material": 0, "radius": 1.0, "center": [x,y,z]}
      ],
      "meshes": [
        {"material": 1, "translation": [x,y,z], "rotation_deg": 0.0,
         "scale": 1.0, "obj": "path/to/model.obj", "use_mtl": false},
        {"material": 1, "positions": [[x,y,z], ...],
         "indices": [[i0,i1,i2], ...]}
      ],
      "lights": [
        {"type": "point",  "position": [x,y,z], "color": [r,g,b],
         "intensity": 10.0, "color_temp": 5500.0},
        {"type": "square", "position": [x,y,z], "normal": [x,y,z],
         "half_width": 3.0, "color": [r,g,b], "intensity": 5.0,
         "color_temp": 5500.0}
      ],
      "camera": {"eye": [x,y,z], "look_at": [x,y,z], "vfov": 60.0,
                 "aperture": 0.0, "focus_dist": 10.0}
    }

`camera` is optional metadata returned alongside the scene — callers that
only want geometry may ignore it. OBJ paths are resolved relative to the
JSON file's directory.
"""

from __future__ import annotations

import json
import os

import numpy as np

from tpurt.scene import Light, Material, MeshData, Scene, Sphere, build_scene

_MTYPES = {0: "diffuse", 1: "dielectric", 2: "metal", 3: "emissive"}


def load_scene_json(path: str):
    """Parse a JSON scene file -> (Scene, camera dict | None)."""
    with open(path) as f:
        doc = json.load(f)
    base = os.path.dirname(os.path.abspath(path))

    materials = []
    for m in doc.get("materials", []):
        kind = m.get("type", "diffuse")
        if kind == "diffuse":
            materials.append(Material.diffuse(m.get("color", (0.8, 0.8, 0.8)),
                                              float(m.get("roughness", 0.0))))
        elif kind == "dielectric":
            materials.append(Material.dielectric(float(m.get("ior", 1.5)),
                                                 float(m.get("roughness", 0.0))))
        elif kind == "metal":
            materials.append(Material.metal(m.get("color", (0.9, 0.9, 0.9)),
                                            float(m.get("roughness", 0.0))))
        elif kind == "emissive":
            materials.append(Material.emissive(
                m.get("color", (1.0, 1.0, 1.0)),
                float(m.get("intensity", 1.0))))
        else:
            raise ValueError(f"unknown material type {kind!r}")

    spheres = [Sphere(int(sp.get("material", 0)), float(sp["radius"]),
                      tuple(sp["center"]))
               for sp in doc.get("spheres", [])]

    meshes = []
    for me in doc.get("meshes", []):
        mesh = MeshData(material_id=int(me.get("material", 0)),
                        translation=tuple(me.get("translation", (0, 0, 0))),
                        rotation_deg=float(me.get("rotation_deg", 0.0)),
                        scale=float(me.get("scale", 1.0)))
        if "obj" in me:
            if me.get("use_mtl", False):
                # mtllib/usemtl materials append to the document's list;
                # "material" stays the fallback for unmatched faces
                mesh.load_obj(os.path.join(base, me["obj"]),
                              materials=materials)
            else:
                mesh.load_obj(os.path.join(base, me["obj"]))
        else:
            mesh.add_triangles(np.asarray(me["positions"], np.float32),
                               np.asarray(me["indices"], np.int32))
        meshes.append(mesh)

    lights = []
    for lt in doc.get("lights", []):
        kind = lt.get("type", "point")
        if kind == "point":
            lights.append(Light.point(lt["position"],
                                      lt.get("color", (1.0, 1.0, 1.0)),
                                      float(lt.get("intensity", 1.0)),
                                      float(lt.get("color_temp", 0.0))))
        elif kind == "square":
            lights.append(Light.square_area(
                lt["position"], lt.get("normal", (0.0, -1.0, 0.0)),
                float(lt.get("half_width", 1.0)),
                lt.get("color", (1.0, 1.0, 1.0)),
                float(lt.get("intensity", 1.0)),
                float(lt.get("color_temp", 0.0))))
        else:
            raise ValueError(f"unknown light type {kind!r}")

    n_mats = len(materials) or 1
    for sp in spheres:
        if not 0 <= sp.material_id < n_mats:
            raise ValueError(
                f"sphere material {sp.material_id} out of range "
                f"(have {n_mats} materials)")
    for me in meshes:
        if not 0 <= me.material_id < n_mats:
            raise ValueError(
                f"mesh material {me.material_id} out of range "
                f"(have {n_mats} materials)")

    return build_scene(materials, spheres, meshes, lights), doc.get("camera")


def save_scene_json(path: str, scene: Scene, camera: dict | None = None
                    ) -> None:
    """Serialize a built Scene's SoA back to the JSON schema. Meshes are
    written as inline positions/indices — the SoA stores baked (a, e1, e2)
    edges, so vertices are reconstructed per triangle (shared vertices are
    NOT re-deduplicated, and the reload re-derives edges from the
    f32-rounded reconstructed vertices, so geometry matches up to ~1 ulp
    of the vertex magnitude — exact for unit-scale scenes, approximate
    for millimeter detail placed thousands of units from the origin)."""
    mats = []
    for i in range(int(np.asarray(scene.mat_color).shape[0])):
        kind = _MTYPES[int(scene.mat_type[i])]
        rec = {"type": kind, "roughness": float(scene.mat_rough[i])}
        if kind == "dielectric":
            rec["ior"] = float(scene.mat_ior[i])
        else:
            rec["color"] = [float(x) for x in np.asarray(scene.mat_color[i])]
        mats.append(rec)

    sphs = [{"material": int(scene.sph_mat[i]),
             "radius": float(scene.sph_radius[i]),
             "center": [float(x) for x in np.asarray(scene.sph_center[i])]}
            for i in range(scene.num_spheres)]

    doc = {"materials": mats, "spheres": sphs, "meshes": [], "lights": []}
    T = scene.num_triangles
    if T:
        a = np.asarray(scene.tri_a, np.float64)
        e1 = np.asarray(scene.tri_e1, np.float64)
        e2 = np.asarray(scene.tri_e2, np.float64)
        tm = np.asarray(scene.tri_mat)
        for mat in sorted(set(int(x) for x in tm)):
            sel = np.flatnonzero(tm == mat)
            pos = np.concatenate([a[sel], a[sel] + e1[sel],
                                  a[sel] + e2[sel]], axis=1)
            pos = pos.reshape(-1, 3)
            idx = np.arange(pos.shape[0], dtype=np.int32).reshape(-1, 3)
            doc["meshes"].append({
                "material": mat,
                "positions": [[float(x) for x in p] for p in pos],
                "indices": [[int(x) for x in t] for t in idx],
            })

    for j in range(scene.num_lights):
        kind = "point" if int(scene.light_type[j]) == 0 else "square"
        rec = {"type": kind,
               "position": [float(x) for x in np.asarray(scene.light_pos[j])],
               "color": [float(x) for x in np.asarray(scene.light_color[j])],
               "intensity": float(scene.light_intensity[j]),
               "color_temp": float(scene.light_temp[j])}
        if kind == "square":
            rec["half_width"] = float(scene.light_hw[j])
            rec["normal"] = [float(x)
                             for x in np.asarray(scene.light_normal[j])]
        doc["lights"].append(rec)
    if camera:
        doc["camera"] = camera
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
