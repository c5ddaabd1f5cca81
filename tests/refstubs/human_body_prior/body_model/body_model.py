"""human_body_prior BodyModel import stand-in
(egoego/data/amass_diffusion_dataset.py:9).  Never constructed by the oracle
tests (no SMPL npz assets); raises on use."""


class BodyModel:
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "refstubs human_body_prior has no body-model assets"
        )
