"""mujoco_py import stand-in so the reference env MODULES import; the class
methods we bind as oracles (get_full_obs*, compute_desired_accel, ...) are
pure numpy over duck-typed state and never touch these symbols."""
from types import SimpleNamespace


def _mj_fullM(model, dst, qM):
    """mujoco-py mj_fullM(model, flat_dst, qM) signature, forwarded to real
    mujoco 3 (which takes (model, DATA, dst_2d)) — the caller's duck model
    must carry ._m (MjModel) and ._d (MjData); qM is ignored since the live
    MjData provides it.  Used by the bound compute_desired_accel oracle."""
    import mujoco
    import numpy as _np

    m = getattr(model, "_m", model)
    d = model._d
    out = _np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, out)
    dst[:] = out.ravel()


functions = SimpleNamespace(mj_fullM=_mj_fullM)


class _ModelShim:
    """mujoco-py model attribute surface backed by REAL mujoco 3 — enough
    for relive/utils/torch_smpl_humanoid.Humanoid (body_pos/body_ipos/
    body_parentid/body_names/_body_name2id)."""

    def __init__(self, path):
        import mujoco
        import numpy as _np

        try:
            m = mujoco.MjModel.from_xml_path(path)
        except ValueError:
            # the bundled kinpoly MJCFs use pre-2.3.3 global coordinates;
            # reuse the repo's auto-converter
            from egoego_release_tpu.ops.mujoco_compat import load_humanoid_model

            m = load_humanoid_model(path)
        self._m = m
        self.body_pos = _np.array(m.body_pos)
        self.body_ipos = _np.array(m.body_ipos)
        self.body_parentid = _np.array(m.body_parentid)
        self.geom_bodyid = _np.array(m.geom_bodyid)
        self.geom_size = _np.array(m.geom_size)
        names = [
            mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, i) or ""
            for i in range(m.nbody)
        ]
        self.body_names = tuple(names)
        self._body_name2id = {n: i for i, n in enumerate(names)}


def load_model_from_path(path):
    return _ModelShim(path)


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
