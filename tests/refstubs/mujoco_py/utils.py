def rec_copy(*a, **k):
    raise RuntimeError("mujoco_py stub")


def rec_assign(*a, **k):
    raise RuntimeError("mujoco_py stub")
