"""evo.tools.file_interface import stand-in (unused by the oracle tests)."""


def read_tum_trajectory_file(*a, **k):
    raise NotImplementedError("refstubs evo cannot read trajectory files")
