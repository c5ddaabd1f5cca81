"""evo.main_ape import stand-in (unused by the oracle tests)."""


def ape(*a, **k):
    raise NotImplementedError("refstubs evo has no APE pipeline")
