"""Torch oracle loader: imports the reference PyTorch model IN PLACE.

We never copy reference code — tests import it from /root/reference so the
oracle is the reference, byte for byte. torch 2.x removed nothing these files
need except that `F.sigmoid` warns; instantiation verified on CPU.
"""
import os
import sys

X4_DIR = "/root/reference/CODON_X4"
X16_DIR = "/root/reference/CODON_X16"


def load_reference_codonnet():
    """Returns the reference CODONNet class (X4/X8 flavor, with dead heads)."""
    if X4_DIR not in sys.path:
        sys.path.insert(0, X4_DIR)
    import CODON_x4  # noqa: reference module, torch
    return CODON_x4.CODONNet


# (X16 oracle loading lives in test_x16_variants._load_x16_module, which
# isolates the CAC_module shadowing via importlib instead of sys.path
# surgery; a second loader here was dead code and leaked sys.path state.)
