"""evo.core.metrics import stand-in."""


class PoseRelation:
    translation_part = "translation part"
    rotation_part = "rotation part"
    full_transformation = "full transformation"
    rotation_angle_rad = "rotation angle in radians"
    rotation_angle_deg = "rotation angle in degrees"
