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


def load_reference_x16():
    """Returns (BaseNet_RMCR_fuseRMCR, CODONNet-no-dead-heads) from X16."""
    # X16 dir shadows X4's CAC_module by sys.path order; import fresh.
    saved = dict(sys.modules)
    for m in ("CODON_x16", "CAC_module"):
        sys.modules.pop(m, None)
    if X4_DIR in sys.path:
        sys.path.remove(X4_DIR)
    if X16_DIR not in sys.path:
        sys.path.insert(0, X16_DIR)
    import CODON_x16  # noqa
    cls = (CODON_x16.BaseNet_RMCR_fuseRMCR, CODON_x16.CODONNet)
    # restore module cache for X4-based tests
    sys.path.remove(X16_DIR)
    for m in ("CODON_x16", "CAC_module"):
        sys.modules.pop(m, None)
    sys.modules.update({k: v for k, v in saved.items() if k not in sys.modules})
    return cls
