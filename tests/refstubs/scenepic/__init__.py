"""scenepic import stand-in (egoego/vis/mesh_motion.py:15).  Attribute access
returns inert placeholders; the HTML-scene functions are never exercised by
the oracle tests."""


class _Stub:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return _Stub()

    def __getattr__(self, name):
        return _Stub()


def __getattr__(name):
    return _Stub()
