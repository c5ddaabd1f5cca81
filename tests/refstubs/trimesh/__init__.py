"""trimesh import stand-in (egoego/vis/mesh_motion.py:17); mesh loading is
never exercised by the oracle tests."""


def load_mesh(*a, **k):
    raise NotImplementedError("refstubs trimesh cannot load meshes")


class creation:
    @staticmethod
    def uv_sphere(*a, **k):
        raise NotImplementedError("refstubs trimesh cannot create meshes")
