"""smplx import stand-in (body_model/body_model.py:7-9).  The oracle tests
never construct a body model (no SMPL npz assets in this environment); the
classes raise on use."""


class _Unavailable:
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "refstubs smplx has no body-model assets; construct the JAX "
            "BodyModel from egoego_release_tpu.ops.smpl instead"
        )


SMPL = SMPLH = SMPLX = _Unavailable
