"""MTL material libraries (utils/obj.py parse_mtl/parse_obj_mtl).

Beyond-reference extension: the reference assigns one material per mesh
(src/instance.rs:88-92, call site src/lib.rs:267-271); tpurt's device
scene already carries per-triangle ids (Scene.tri_mat), so mtllib/usemtl
is pure host-side loading.
"""

import numpy as np

from tpurt import Light, Material, RenderConfig, Sphere, build_scene, make_camera
from tpurt.render import init_state, render
from tpurt.scene import MeshData
from tpurt.utils.obj import mtl_to_material, parse_mtl, parse_obj_mtl

MTL = """# comment
newmtl red_wall
Kd 0.7 0.1 0.1
Ns 10

newmtl glass
Kd 1 1 1
Ni 1.5
d 0.0
illum 7

newmtl gold
Kd 0.2 0.2 0.2
Ks 1.0 0.71 0.29
Pm 1.0
Pr 0.1

newmtl foil
Ks 0.95 0.93 0.88
Pm 0.6
Ns 300
"""

OBJ = """mtllib cube.mtl missing.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
usemtl red_wall
v 0 0 1
v 1 0 1
v 1 1 1
f -3 -2 -1
usemtl glass
f 1 2 5
usemtl nosuchname
f 2 3 5
"""


def _write(tmp_path):
    (tmp_path / "cube.mtl").write_text(MTL)
    p = tmp_path / "cube.obj"
    p.write_text(OBJ)
    return str(p)


def test_parse_mtl_fields(tmp_path):
    (tmp_path / "m.mtl").write_text(MTL + "\nnewmtl trmat\nKd 1 1 1\nTr 0.8\n")
    defs = parse_mtl(str(tmp_path / "m.mtl"))
    assert set(defs) == {"red_wall", "glass", "gold", "foil", "trmat"}
    assert defs["red_wall"]["Kd"] == (0.7, 0.1, 0.1)
    assert defs["glass"]["illum"] == 7 and defs["glass"]["d"] == 0.0
    assert defs["gold"]["Pm"] == 1.0 and defs["gold"]["Pr"] == 0.1
    assert abs(defs["trmat"]["d"] - 0.2) < 1e-6  # Tr = 1 - d


def test_mtl_to_material_mapping():
    defs = {
        "red_wall": {"Kd": (0.7, 0.1, 0.1), "Ns": 10.0},
        "glass": {"Kd": (1, 1, 1), "Ni": 1.5, "d": 0.0, "illum": 7},
        "gold": {"Kd": (0.2,) * 3, "Ks": (1.0, 0.71, 0.29), "Pm": 1.0,
                 "Pr": 0.1},
        "foil": {"Ks": (0.95, 0.93, 0.88), "Pm": 0.6, "Ns": 300.0},
    }
    red = mtl_to_material(defs["red_wall"])
    assert red.mtype == 0 and red.color == (0.7, 0.1, 0.1)
    glass = mtl_to_material(defs["glass"])
    assert glass.mtype == 1 and glass.ior == 1.5
    # alpha^2 with alpha = sqrt(2/(Ns+2)); glass has no Ns -> default 1000
    assert abs(glass.roughness - 2.0 / 1002.0) < 1e-9
    gold = mtl_to_material(defs["gold"])
    assert gold.mtype == 2 and gold.color == (1.0, 0.71, 0.29)
    assert abs(gold.roughness - 0.01) < 1e-9  # Pr^2
    foil = mtl_to_material(defs["foil"])
    assert foil.mtype == 2 and abs(foil.roughness - 2.0 / 302.0) < 1e-9


def test_parse_obj_mtl_slots(tmp_path):
    path = _write(tmp_path)
    pos, idx, tri_slot, slot_names, defs = parse_obj_mtl(path)
    assert pos.shape == (7, 3) and idx.shape == (5, 3)
    # quad before any usemtl fans into 2 tris on slot 0 (None);
    # then one red_wall tri (negative indices), one glass, one unknown name
    assert slot_names[0] is None
    assert slot_names[1:] == ["red_wall", "glass", "nosuchname"]
    np.testing.assert_array_equal(tri_slot, [0, 0, 1, 2, 3])
    # negative indices resolved against the *current* vertex count
    np.testing.assert_array_equal(idx[2], [4, 5, 6])
    # the missing library is skipped, the real one parsed
    assert "glass" in defs and "nosuchname" not in defs


def test_meshdata_load_obj_with_materials(tmp_path):
    path = _write(tmp_path)
    materials = [Material.diffuse((0.5, 0.5, 0.5))]  # pre-existing id 0
    mesh = MeshData(material_id=0)
    mesh.load_obj(path, materials=materials)
    # red_wall + glass appended (gold/foil are defined but unused by faces;
    # nosuchname has no definition -> falls back to mesh.material_id)
    assert len(materials) == 3
    assert materials[1].mtype == 0 and materials[2].mtype == 1
    np.testing.assert_array_equal(mesh.tri_material, [0, 0, 1, 2, 0])

    # uniform path unchanged
    mesh2 = MeshData(material_id=7)
    mesh2.load_obj(path)
    np.testing.assert_array_equal(mesh2.tri_material, [7] * 5)


def test_scene_json_use_mtl(tmp_path):
    """JSON scenes can opt into MTL libraries per mesh ("use_mtl": true);
    the mapped materials append after the document's own list and the
    round-trip through save_scene_json preserves the per-face split."""
    import json

    from tpurt.utils.scene_io import load_scene_json, save_scene_json

    path = _write(tmp_path)
    doc = {
        "materials": [{"type": "diffuse", "color": [0.5, 0.5, 0.5]}],
        "spheres": [{"material": 0, "radius": 1.0, "center": [0, 1, 0]}],
        "meshes": [{"material": 0, "obj": "cube.obj", "use_mtl": True}],
        "lights": [{"type": "point", "position": [0, 5, 0],
                    "intensity": 10.0, "color_temp": 5500.0}],
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(doc))
    scene, _ = load_scene_json(str(p))
    # doc material + red_wall + glass appended
    assert scene.mat_color.shape[0] == 3
    tm = set(int(x) for x in np.asarray(scene.tri_mat))
    assert tm == {0, 1, 2}

    # round-trip keeps the per-face material split
    q = tmp_path / "roundtrip.json"
    save_scene_json(str(q), scene)
    scene2, _ = load_scene_json(str(q))
    np.testing.assert_array_equal(
        np.sort(np.asarray(scene.tri_mat)), np.sort(np.asarray(scene2.tri_mat)))

    # without use_mtl the same document keeps one material
    doc["meshes"][0]["use_mtl"] = False
    p.write_text(json.dumps(doc))
    scene3, _ = load_scene_json(str(p))
    assert scene3.mat_color.shape[0] == 1


def test_per_face_materials_render(tmp_path):
    """End-to-end: a two-face mesh with different per-face materials
    renders, and the per-face ids actually reach the estimator (the two
    halves differ; swapping the MTL colors swaps the halves)."""
    (tmp_path / "w.mtl").write_text(
        "newmtl bright\nKd 0.9 0.9 0.9\nnewmtl dark\nKd 0.05 0.05 0.05\n")

    def write_obj(first, second):
        # upward-winding floor halves (split along the -z..+z diagonal)
        (tmp_path / "w.obj").write_text(
            "mtllib w.mtl\n"
            "v -4 0 -4\nv 4 0 -4\nv 4 0 4\nv -4 0 4\n"
            f"usemtl {first}\nf 1 3 2\n"
            f"usemtl {second}\nf 1 4 3\n")
        materials = []
        mesh = MeshData(material_id=0)
        mesh.load_obj(str(tmp_path / "w.obj"), materials=materials)
        # the sphere gets its own material id so the MTL slots stay
        # independent of it in both assignments
        materials.append(Material.diffuse((0.5, 0.5, 0.5)))
        return build_scene(
            materials=materials,
            spheres=[Sphere(material_id=len(materials) - 1, scale=0.5,
                            translation=(0, 0.5, 0))],
            meshes=[mesh],
            lights=[Light.square_area((0, 6, 0), (0, -1, 0), 2.0,
                                      (1, 1, 1), 60.0, 5500.0)])

    cfg = RenderConfig(width=32, height=32, depth=3, tile_size=1024)
    cam = make_camera((0, 6, 0.01), (0, 0, 0), vfov=70.0, aspect_ratio=1.0)

    def resolve(scene):
        st = render(scene, cfg, cam, init_state(cfg), 3, 4)
        img = np.asarray(st.rgb_sum) / max(float(np.asarray(st.n_samples).max()), 1)
        assert np.isfinite(img).all()
        return img

    img_a = resolve(write_obj("bright", "dark"))
    img_b = resolve(write_obj("dark", "bright"))
    # same scene geometry, opposite face materials: total energy matches the
    # mirrored assignment, and each render is visibly two-toned
    assert abs(img_a.mean() - img_b.mean()) < 0.25 * max(img_a.mean(), 1e-6)
    lum_a = img_a.mean(-1)
    assert lum_a.max() > 4.0 * max(np.median(lum_a), 1e-6) or lum_a.std() > 0
    # the bright/dark split flips between the two assignments
    diff = img_a.mean(-1) - img_b.mean(-1)
    assert diff.max() > 1e-4 and diff.min() < -1e-4
