from egoego_release_tpu.ops import rotations, heading, fk, alignment
