"""Drive the bpy render scripts end-to-end with a stubbed `bpy` module.

Blender is not installed in CI, so these tests install a minimal fake bpy in
sys.modules implementing exactly the API surface the scripts touch (object
registry, material nodes, import/render/scene operators).  The render
operator writes a marker file at scene.render.filepath, so frame output and
per-frame object cleanup are asserted for real — this covers the scripts'
whole control flow (reference counterparts:
egoego/vis/blender_vis_{human,cmp_human,headpose}_utils.py).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

SCRIPTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "egoego_release_tpu", "vis", "bpy_scripts",
)


class _Polygon:
    def __init__(self):
        self.use_smooth = False


class _Mesh:
    def __init__(self):
        self.polygons = [_Polygon() for _ in range(4)]


class _Object:
    def __init__(self, name, kind="MESH"):
        self.name = name
        self.kind = kind
        self.data = _Mesh() if kind == "MESH" else types.SimpleNamespace(energy=0.0)
        self.location = (0.0, 0.0, 0.0)
        self.rotation_euler = (0.0, 0.0, 0.0)
        self.rotation_quaternion = (1.0, 0.0, 0.0, 0.0)
        self.rotation_mode = "XYZ"
        self.active_material = None
        self.empty_display_size = 1.0
        self.hide_render = False


class _Registry:
    """List-backed like Blender: lookups by current .name, names uniquified
    on add ('00000' -> '00000.001'), renames take effect immediately."""

    def __init__(self):
        self._items = []

    def keys(self):
        return [o.name for o in self._items]

    def __getitem__(self, key):
        for o in self._items:
            if o.name == key:
                return o
        raise KeyError(key)

    def get(self, key):
        for o in self._items:
            if o.name == key:
                return o
        return None

    def add(self, obj):
        if self.get(obj.name) is not None:
            base, i = obj.name, 1
            while self.get(f"{base}.{i:03d}") is not None:
                i += 1
            obj.name = f"{base}.{i:03d}"
        self._items.append(obj)
        return obj

    def remove(self, obj, do_unlink=False):
        self._items = [o for o in self._items if o is not obj]

    def __iter__(self):
        return iter(list(self._items))

    def __len__(self):
        return len(self._items)


class _Material:
    def __init__(self, name):
        self.name = name
        self.users = 1
        self.use_nodes = False
        bsdf = types.SimpleNamespace(inputs={0: types.SimpleNamespace(default_value=None)})
        self.node_tree = types.SimpleNamespace(nodes={"Principled BSDF": bsdf})


class _Materials(_Registry):
    def new(self, name):
        return self.add(_Material(name))


def _make_fake_bpy():
    bpy = types.ModuleType("bpy")
    objects = _Registry()
    materials = _Materials()
    scene = types.SimpleNamespace(
        render=types.SimpleNamespace(
            filepath="", resolution_x=0, resolution_y=0, use_persistent_data=False
        ),
        camera=None,
    )
    context = types.SimpleNamespace(scene=scene, active_object=None)
    bpy.data = types.SimpleNamespace(objects=objects, materials=materials)
    bpy.context = context
    counters = {"mesh": 0, "misc": 0}

    def _new_object(kind_prefix, kind="MISC"):
        counters["misc"] += 1
        obj = objects.add(_Object(f"{kind_prefix}.{counters['misc']:03d}", kind))
        context.active_object = obj
        return obj

    def _import_mesh(filepath="", **kw):
        counters["mesh"] += 1
        name = os.path.basename(filepath).rsplit(".", 1)[0]
        obj = objects.add(_Object(name, "MESH"))
        context.active_object = obj

    def _render(write_still=False):
        if write_still:
            with open(scene.render.filepath, "w") as f:
                f.write("frame")

    bpy.ops = types.SimpleNamespace(
        wm=types.SimpleNamespace(
            obj_import=_import_mesh,
            ply_import=_import_mesh,
            open_mainfile=lambda filepath="": None,
            quit_blender=lambda: None,
        ),
        import_scene=types.SimpleNamespace(obj=_import_mesh),
        import_mesh=types.SimpleNamespace(ply=_import_mesh),
        mesh=types.SimpleNamespace(
            primitive_plane_add=lambda **kw: _new_object("floor_src")
        ),
        object=types.SimpleNamespace(
            light_add=lambda **kw: _new_object("sun_src", "LIGHT"),
            camera_add=lambda **kw: _new_object("camera_src", "CAMERA"),
            empty_add=lambda **kw: _new_object("empty_src", "EMPTY"),
        ),
        render=types.SimpleNamespace(render=_render),
    )
    return bpy


@pytest.fixture()
def fake_bpy(monkeypatch):
    bpy = _make_fake_bpy()
    monkeypatch.setitem(sys.modules, "bpy", bpy)
    monkeypatch.syspath_prepend(SCRIPTS_DIR)
    # force re-import against the fake bpy
    for mod in ("render_human", "render_cmp", "render_headpose"):
        sys.modules.pop(mod, None)
    yield bpy
    for mod in ("render_human", "render_cmp", "render_headpose"):
        sys.modules.pop(mod, None)


def _write_objs(folder, n):
    os.makedirs(folder, exist_ok=True)
    for i in range(n):
        with open(os.path.join(folder, f"{i:05d}.obj"), "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")


def test_render_human_script(fake_bpy, tmp_path):
    render_human = importlib.import_module("render_human")
    objs, out = tmp_path / "objs", tmp_path / "frames"
    _write_objs(objs, 3)
    head = tmp_path / "head.npy"
    np.save(head, np.tile([0.0, 0.0, 1.6, 1.0, 0.0, 0.0, 0.0], (3, 1)))

    args = render_human.parse_args(
        ["--folder", str(objs), "--out-folder", str(out),
         "--material-color", "orange", "--head-path", str(head)]
    )
    n = render_human.render_sequence(args)
    assert n == 3
    assert sorted(os.listdir(out)) == ["00000.jpg", "00001.jpg", "00002.jpg"]
    # meshes removed per frame; gizmo + scene rig remain
    kinds = [o.kind for o in fake_bpy.data.objects]
    assert "MESH" not in kinds or all(
        o.name.startswith("floor") for o in fake_bpy.data.objects if o.kind == "MESH"
    )
    gizmo = fake_bpy.data.objects.get("head_gizmo")
    assert gizmo is not None and gizmo.location == (0.0, 0.0, 1.6)
    assert fake_bpy.data.materials.get("orange") is not None


def test_render_cmp_script(fake_bpy, tmp_path):
    render_cmp = importlib.import_module("render_cmp")
    a, b, out = tmp_path / "pred", tmp_path / "gt", tmp_path / "frames"
    _write_objs(a, 2)
    _write_objs(b, 4)  # extra frames are ignored (min length)
    args = render_cmp.parse_args(
        ["--folder", str(a), "--folder2", str(b), "--out-folder", str(out),
         "--offset2", "1.5", "0", "0"]
    )
    n = render_cmp.render_sequence(args)
    assert n == 2
    assert len(os.listdir(out)) == 2
    assert fake_bpy.data.materials.get("blue") is not None
    assert fake_bpy.data.materials.get("green") is not None


def test_render_headpose_script(fake_bpy, tmp_path):
    render_headpose = importlib.import_module("render_headpose")
    head = tmp_path / "head.npy"
    traj = np.zeros((5, 7), np.float32)
    traj[:, 2] = np.linspace(1.5, 1.7, 5)
    traj[:, 3] = 1.0
    np.save(head, traj)
    out = tmp_path / "frames"
    args = render_headpose.parse_args(
        ["--head-path", str(head), "--out-folder", str(out)]
    )
    n = render_headpose.render_sequence(args)
    assert n == 5
    assert len(os.listdir(out)) == 5
    gizmo = fake_bpy.data.objects.get("head_gizmo")
    assert abs(gizmo.location[2] - 1.7) < 1e-6
