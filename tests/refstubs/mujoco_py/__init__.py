"""mujoco_py import stand-in so the reference env MODULES import; the class
methods we bind as oracles (get_full_obs*, compute_desired_accel, ...) are
pure numpy over duck-typed state and never touch these symbols."""
from types import SimpleNamespace

functions = SimpleNamespace()


def load_model_from_path(path):  # pragma: no cover - constructor-only
    raise RuntimeError("mujoco_py stub: not runnable in tests")


class MjSim:  # pragma: no cover
    def __init__(self, *a, **k):
        raise RuntimeError("mujoco_py stub: not runnable in tests")


class MjViewer:  # pragma: no cover
    def __init__(self, *a, **k):
        raise RuntimeError("mujoco_py stub: not runnable in tests")


from mujoco_py.builder import cymj  # noqa: F401


def rec_copy(*a, **k):  # pragma: no cover
    raise RuntimeError("mujoco_py stub")


def rec_assign(*a, **k):  # pragma: no cover
    raise RuntimeError("mujoco_py stub")


utils = SimpleNamespace(rec_copy=rec_copy, rec_assign=rec_assign)
