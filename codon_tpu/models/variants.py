"""Model-variant registry.

The reference ships ~23 ablation networks as copy-pasted classes in one
3395-line file (/root/reference/CODON_X4/base_net_withoutBN.py, catalog in
SURVEY.md §2.2). Here variants are configuration, not copy-paste: each entry
pairs a CodonConfig/forward-fn combination under a stable name. The zoo
grows in models/zoo.py; this module owns the registry surface.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict

from codon_tpu.core.params import DTypePolicy, FP32
from codon_tpu.models.codon_net import (CodonConfig, codon_forward,
                                        codon_forward_fused,
                                        init_codon_params,
                                        sequential_tower_forward)


@dataclasses.dataclass(frozen=True)
class Variant:
    name: str
    cfg: CodonConfig
    init_fn: Callable
    forward_fn: Callable
    doc: str = ""

    def init(self, key):
        return self.init_fn(key, self.cfg)

    def forward(self, params, depth, color, mask=None, ops=None):
        return self.forward_fn(params, depth, color, cfg=self.cfg,
                               mask=mask, ops=ops)


_REGISTRY: Dict[str, Callable[[DTypePolicy], Variant]] = {}


def register(name: str, doc: str = ""):
    def deco(builder):
        _REGISTRY[name] = (builder, doc)
        return builder
    return deco


def get_variant(name: str, dtypes: DTypePolicy = FP32) -> Variant:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown variant '{name}'; available: {sorted(_REGISTRY)}")
    builder, doc = _REGISTRY[name]
    v = builder(dtypes)
    return dataclasses.replace(v, doc=doc)


def list_variants():
    return sorted(_REGISTRY)


@register("codon", "published CODONNet, X4/X8 flavor (incl. dead heads; "
          "reference CODON_x4.py:18)")
def _codon(dtypes):
    cfg = CodonConfig(dead_heads=True, dtypes=dtypes)
    return Variant("codon", cfg, init_codon_params, codon_forward)


@register("codon_fused", "CODONNet with merged-tower grouped convs — "
          "numerically identical, same checkpoints; runs the full quant "
          "family too (compound grouped site names resolve to the "
          "packed-site scales). Measured SLOWER than the packed-cell "
          "codon forward on v5e — an ablation point, not the shipping "
          "lowering")
def _codon_fused(dtypes):
    cfg = CodonConfig(dead_heads=True, dtypes=dtypes)
    return Variant("codon_fused", cfg, init_codon_params,
                   codon_forward_fused)


@register("codon_sc", "scale-conditioned CODONNet: depth stem takes 2 "
          "channels (depth, constant scale/16 plane) so ONE model "
          "trains jointly on all three shipped degradations and can "
          "tell them apart (train --mix-scales --scale-cond); residual "
          "and head read channel 0. No dead heads (new lineage, no "
          "reference-checkpoint compat needed)")
def _codon_sc(dtypes):
    cfg = CodonConfig(dead_heads=False, in_channels=2, dtypes=dtypes)
    return Variant("codon_sc", cfg, init_codon_params, codon_forward)


@register("codon_x16", "CODONNet without dead attention heads "
          "(reference CODON_x16.py:92)")
def _codon_x16(dtypes):
    cfg = CodonConfig(dead_heads=False, dtypes=dtypes)
    return Variant("codon_x16", cfg, init_codon_params, codon_forward)


@register("codonet_x16_model", "CODON_X16/model/CODONet.py flavor: color "
          "cell concat swapped (3x3 first); weight-compatible with codon_x16")
def _codonet_x16_model(dtypes):
    cfg = CodonConfig(dead_heads=False, color_cat_swapped=True,
                      dtypes=dtypes)
    return Variant("codonet_x16_model", cfg, init_codon_params,
                   codon_forward)


def _register_codon_fn(n):
    @register(f"codon_f{n}", f"CODONNet with {n} fusion MC iterations "
              "instead of 3 — the fusion loop reuses one weight set "
              "(CODON_x4.py:122-128), so the param pytree is IDENTICAL "
              "to 'codon': checkpoints interchange, making this a "
              "test-time/train-time compute knob and an "
              "architecture-diverse ensemble member")
    def _codon_fn(dtypes, n=n):
        cfg = CodonConfig(dead_heads=True, num_fuse=n, dtypes=dtypes)
        return Variant(f"codon_f{n}", cfg, init_codon_params,
                       codon_forward)


for _n in (4, 5, 6, 7):
    _register_codon_fn(_n)


@register("rmcr_fuse_rmcr", "attention-free CODON skeleton, sequential "
          "towers (reference CODON_x16.py:16, base_net_withoutBN.py:1882)")
def _rmcr(dtypes):
    cfg = CodonConfig(use_cac=False, dtypes=dtypes)
    return Variant("rmcr_fuse_rmcr", cfg, init_codon_params,
                   sequential_tower_forward)


# ---------------------------------------------------------------------------
# ablation-zoo bridging: every zoo net is addressable as "zoo:<name>"
# ---------------------------------------------------------------------------

def _register_zoo():
    from codon_tpu.models import zoo as _zoo

    def make_builder(zname):
        def builder(dtypes):
            cfg = CodonConfig(dtypes=dtypes)

            def init_fn(key, _cfg):
                return _zoo.zoo_init(zname, key,
                                     dtype=dtypes.param_dtype)

            def forward_fn(params, depth, color, *, cfg, mask=None,
                           ops=None):
                return _zoo.zoo_forward(zname, params, depth, color,
                                        dtypes=cfg.dtypes, ops=ops,
                                        mask=mask)

            return Variant(f"zoo:{zname}", cfg, init_fn, forward_fn)
        return builder

    for zname in _zoo.list_zoo():
        _REGISTRY[f"zoo:{zname}"] = (make_builder(zname),
                                     _zoo.ZOO[zname]["doc"])


_register_zoo()
