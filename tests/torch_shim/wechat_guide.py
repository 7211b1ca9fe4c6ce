"""Shim for the missing `wechat_guide` module (base_net_withoutBN.py:15-16).

SURVEY.md confirms wechat_guide.{ChannelGate,SpatialGate} ==
CAC_module.{CAC_channel,CAC_spatial} (the half-width-gate shapes match,
e.g. base_net_withoutBN.py:2355-2366 vs CAC_module.py:34). Loads the
reference's own CAC_module in place — no code copied.
"""
import importlib.util
import sys

_spec = importlib.util.spec_from_file_location(
    "_ref_cac_module", "/root/reference/CODON_X4/CAC_module.py")
_mod = importlib.util.module_from_spec(_spec)
sys.modules["_ref_cac_module"] = _mod
_spec.loader.exec_module(_mod)

ChannelGate = _mod.CAC_channel
SpatialGate = _mod.CAC_spatial
