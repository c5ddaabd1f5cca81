"""Import-compatible stand-in for the `bvh` pip package (absent here),
backed by our own parser (egoego_release_tpu.preprocess.mocap_skeleton.BvhData)
— the parser itself is validated against hand-computed values in
tests/test_mocap_skeleton.py, so using it under the reference's
khrylib/mocap/skeleton.py exercises the reference's *skeleton logic*
independently of ours."""

from egoego_release_tpu.preprocess.mocap_skeleton import BvhData


class _JointShim:
    """Mimics bvh.BvhNode just enough for skeleton.py:167:
    `mocap.get_joint(name).children[-1]['OFFSET']`."""

    def __init__(self, joint):
        self._joint = joint

    @property
    def children(self):
        off = self._joint.end_offset
        if off is None:
            off = [0.0, 0.0, 0.0]
        return [{"OFFSET": [str(float(x)) for x in off]}]


class Bvh:
    def __init__(self, text: str):
        self._data = BvhData(text)

    def get_joints_names(self):
        return self._data.get_joints_names()

    def joint_channels(self, name):
        return self._data.joint_channels(name)

    def joint_offset(self, name):
        return self._data.joint_offset(name)

    def joint_parent(self, name):
        return self._data.joint_parent(name)

    def get_joint(self, name):
        return _JointShim(self._data.name2joint[name])
