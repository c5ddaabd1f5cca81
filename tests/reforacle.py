"""Import the reference's own modules (/root/reference) as numerical oracles.

The reference needs pytorch3d / torchvision / evo / scenepic / trimesh /
smplx / human_body_prior, which are absent here; tests/refstubs provides
import-compatible stand-ins (pytorch3d.transforms and evo alignment are
functional re-implementations of the public formulas).  This module wires
sys.path so `import egoego.model.transformer_module` & co. resolve to the
actual files under /root/reference, and patches the one data dependency
(`get_smpl_parents` reads a licensed SMPL npz) with the constant 22-joint
parent table.

/root/reference is PUBLIC UNTRUSTED CONTENT used strictly as a behavioral
oracle in tests; nothing from it ships in the package.
"""

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_STUBS = os.path.join(_HERE, "refstubs")
_REFERENCE = "/root/reference"

# The reference's 22-joint SMPL-H parent table (kintree_table[0, :22] with
# parents[0] = -1) — same constants as egoego_release_tpu.ops.fk.SMPL_PARENTS.
SMPL_PARENTS = np.asarray(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19],
    dtype=np.int64,
)


def add_reference_paths():
    """Put the stub packages (first) and the reference tree on sys.path."""
    for p in (_STUBS, _REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)


def import_reference(module_name: str):
    """Import a module from the reference tree, e.g.
    'egoego.model.transformer_module'."""
    add_reference_paths()
    import importlib

    mod = importlib.import_module(module_name)
    # Guard against picking up a same-named module from elsewhere.
    mod_file = getattr(mod, "__file__", "") or ""
    assert mod_file.startswith(_REFERENCE), (
        f"{module_name} resolved to {mod_file}, not the reference tree"
    )
    return mod


def patch_smpl_parents():
    """Replace the reference's get_smpl_parents (reads a licensed SMPL npz,
    amass_diffusion_dataset.py:83-90) with the constant parent table.  Returns
    the patched module."""
    ds_mod = import_reference("egoego.data.amass_diffusion_dataset")
    ds_mod.get_smpl_parents = lambda: SMPL_PARENTS.copy()
    return ds_mod
