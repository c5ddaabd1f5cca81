"""khrylib mocap tooling port: BVH/offset-table skeleton -> MJCF.

Three oracle layers:
  1. the self-contained BVH parser vs hand-computed values (it also backs
     the `bvh` refstub, so it must be independently validated)
  2. Skeleton.load_from_offsets / load_from_bvh / write_xml GOLDEN vs the
     reference's OWN khrylib/mocap/skeleton.py (imported via refstubs;
     lxml + euler_matrix resolve in the reference tree)
  3. the generated MJCF loads in REAL MuJoCo 3 (via the global->local
     converter) and its rest-pose FK reproduces the bone positions
"""

import sys
import xml.etree.ElementTree as ET

import numpy as np
import pytest

import reforacle

from egoego_release_tpu.preprocess.mocap_skeleton import (
    BvhData,
    Skeleton,
    bvh_motion_to_qpos,
    bvh_to_mjcf,
)

BVH_TEXT = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 40.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT Spine
  {
    OFFSET 0.0 0.0 8.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    JOINT Head
    {
      OFFSET 0.0 0.0 10.0
      CHANNELS 3 Zrotation Xrotation Yrotation
      End Site
      {
        OFFSET 0.0 0.0 4.0
      }
    }
  }
  JOINT LeftLeg
  {
    OFFSET 2.0 0.0 -8.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    End Site
    {
      OFFSET 0.0 0.0 -12.0
    }
  }
}
MOTION
Frames: 2
Frame Time: 0.033333
0.0 0.0 40.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0
1.0 2.0 41.0 10.0 20.0 30.0 5.0 0.0 0.0 0.0 -5.0 0.0 0.0 0.0 15.0
"""

OFFSETS = {
    "Hips": [0.0, 0.0, 1.0],
    "Spine": [0.0, 0.0, 0.2],
    "Head": [0.0, 0.02, 0.25],
    "LeftLeg": [0.05, 0.0, -0.2],
}
PARENTS = {"Spine": "Hips", "Head": "Spine", "LeftLeg": "Hips"}


def test_bvh_parser_hand_computed():
    d = BvhData(BVH_TEXT)
    assert d.get_joints_names() == ["Hips", "Spine", "Head", "LeftLeg"]
    assert d.joint_channels("Hips") == [
        "Xposition", "Yposition", "Zposition",
        "Zrotation", "Xrotation", "Yrotation",
    ]
    assert d.joint_offset("Spine") == (0.0, 0.0, 8.0)
    assert d.joint_parent("Head").name == "Spine"
    assert d.joint_parent("Hips") is None
    np.testing.assert_allclose(d.name2joint["Head"].end_offset, [0, 0, 4.0])
    assert d.frames.shape == (2, 15)
    assert abs(d.frame_time - 0.033333) < 1e-9
    # channel slicing: LeftLeg rotations are the last 3 columns
    np.testing.assert_allclose(d.joint_rotations("LeftLeg")[1], [0.0, 0.0, 15.0])


def _ref_skeleton_cls():
    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    from copycat.khrylib.mocap.skeleton import Skeleton as RefSkeleton

    return RefSkeleton


TEMPLATE = """<mujoco model="template">
  <compiler angle="degree" coordinate="global"/>
  <worldbody/>
  <actuator/>
</mujoco>
"""


def _xml_equal(a: ET.Element, b: ET.Element):
    assert a.tag == b.tag, (a.tag, b.tag)
    assert dict(a.attrib) == dict(b.attrib), (a.tag, a.attrib, b.attrib)
    ca, cb = list(a), list(b)
    assert len(ca) == len(cb), (a.tag, len(ca), len(cb))
    for x, y in zip(ca, cb):
        _xml_equal(x, y)


@pytest.mark.parametrize("mode", ["offsets", "bvh"])
def test_skeleton_golden_vs_reference(tmp_path, mode):
    RefSkeleton = _ref_skeleton_cls()
    template = tmp_path / "template.xml"
    template.write_text(TEMPLATE)
    bvh_file = tmp_path / "motion.bvh"
    bvh_file.write_text(BVH_TEXT)

    ours, ref = Skeleton(), RefSkeleton()
    if mode == "offsets":
        ours.load_from_offsets(OFFSETS, PARENTS, scale=1.0)
        ref.load_from_offsets(OFFSETS, PARENTS, scale=1.0)
    else:
        ours.load_from_bvh(str(bvh_file))
        ref.load_from_bvh(str(bvh_file))

    assert [b.name for b in ours.bones] == [b.name for b in ref.bones]
    for ob, rb in zip(ours.bones, ref.bones):
        np.testing.assert_allclose(ob.pos, rb.pos, atol=1e-12)
        np.testing.assert_allclose(ob.end, rb.end, atol=1e-12)
        assert ob.dof_index == rb.dof_index
        assert (ob.parent.name if ob.parent else None) == (
            rb.parent.name if rb.parent else None
        )

    ours_xml = tmp_path / "ours.xml"
    ref_xml = tmp_path / "ref.xml"
    ours.write_xml(str(ours_xml), template_fname=str(template))
    ref.write_xml(str(ref_xml), template_fname=str(template))
    _xml_equal(ET.parse(ours_xml).getroot(), ET.parse(ref_xml).getroot())


def test_generated_mjcf_loads_in_mujoco_and_fk_matches(tmp_path):
    import mujoco

    from egoego_release_tpu.ops.mujoco_compat import convert_global_mjcf

    bvh_file = tmp_path / "motion.bvh"
    bvh_file.write_text(BVH_TEXT)
    xml_out = tmp_path / "model.xml"
    qpos_out = tmp_path / "qpos.npy"
    sk, qpos = bvh_to_mjcf(str(bvh_file), str(xml_out), str(qpos_out))

    model = mujoco.MjModel.from_xml_string(convert_global_mjcf(str(xml_out)))
    # free root (7) + 3 hinges x 3 joints
    assert model.nq == 7 + 9
    assert qpos.shape == (2, model.nq)

    # rest pose FK: world body positions == root translation + bone
    # positions (the reference keeps the root bone at the origin —
    # skeleton.py:139-144 never reads the root OFFSET)
    data = mujoco.MjData(model)
    data.qpos[:] = qpos[0]  # frame 0 = rest offsets (zero rotations)
    mujoco.mj_forward(model, data)
    for bone in sk.bones:
        bid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, bone.name)
        np.testing.assert_allclose(
            data.xpos[bid], bone.pos + qpos[0, :3], atol=1e-4
        )

    # frame 1: root free-joint quat equals scipy ZXY euler conversion
    from scipy.spatial.transform import Rotation as sRot

    q_expected = sRot.from_euler("ZXY", [10.0, 20.0, 30.0], degrees=True).as_quat()[
        [3, 0, 1, 2]
    ]
    sign = np.sign(np.dot(qpos[1, 3:7], q_expected))
    np.testing.assert_allclose(qpos[1, 3:7], sign * q_expected, atol=1e-10)
    # hinge angles: radians, model joint order (x before y/z per dof_index)
    data.qpos[:] = qpos[1]
    mujoco.mj_forward(model, data)
    assert np.isfinite(data.xpos).all()
    spine_x = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_JOINT, "Spine_x")
    assert abs(data.qpos[model.jnt_qposadr[spine_x]] - 0.0) < 1e-12
    leg_y = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_JOINT, "LeftLeg_y")
    np.testing.assert_allclose(
        data.qpos[model.jnt_qposadr[leg_y]], np.deg2rad(15.0), atol=1e-12
    )


def test_bvh_motion_to_qpos_channel_mapping(tmp_path):
    """Zrotation 5deg on Spine lands on the Spine_z hinge slot."""
    bvh_file = tmp_path / "motion.bvh"
    bvh_file.write_text(BVH_TEXT)
    sk = Skeleton()
    mocap = sk.load_from_bvh(str(bvh_file))
    qpos = bvh_motion_to_qpos(mocap, sk)
    # layout: 7 root + Spine[z,x,y by dof_index order?]... dof_index sorts by
    # channel order (Z,X,Y) -> indices [2,0,1]; frame 1 Spine rotations are
    # (Z=5, X=0, Y=0)
    spine_cols = qpos[1, 7:10]
    assert np.isclose(spine_cols, np.deg2rad(5.0)).any()
    # root position scaled by 0.0254 (inches -> metres)
    np.testing.assert_allclose(qpos[1, :3], np.asarray([1, 2, 41.0]) * 0.0254)
