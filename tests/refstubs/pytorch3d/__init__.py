"""Minimal pytorch3d stand-in so the reference's own modules import with the
CPU torch in this environment.  Only `pytorch3d.transforms` is provided; it
re-implements the public pytorch3d rotation-conversion API (standard published
formulas) in pure torch, with the same conventions (wxyz quaternions,
standardized quaternion_multiply, Shepperd matrix_to_quaternion with the 0.1
denominator floor, 1e-6 small-angle Taylor switches).

Used ONLY by the golden-oracle tests (tests/test_reference_oracle.py) and
tools/parity_check.py to run /root/reference code as a numerical oracle.
"""
