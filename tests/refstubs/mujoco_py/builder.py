class _AnyBase:
    """Attribute-sprouting base so `class X(cymj.MjRenderContextWindow)`
    definitions in mjviewer.py import (never instantiated in tests)."""

    def __init__(self, *a, **k):
        raise RuntimeError("mujoco_py stub: not runnable in tests")


class _Cymj:
    def __getattr__(self, name):
        return _AnyBase


cymj = _Cymj()
