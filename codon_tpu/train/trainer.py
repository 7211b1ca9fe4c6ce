"""Training step: optax optimizer + masked loss, DP x spatial sharding.

The reference ships NO training code (its argparse mentions --batchSize at
/root/reference/CODON_X4/test.py:22 but no loop exists) and its .pth
checkpoints are absent from the release mount — so the rebuild's trainer is
both a completeness component and the path to real weights.

Design: loss/grad live at the jit level; the forward may be a bare
shard_map'd function (spatial tiling + DP), through which JAX
differentiates — psum/pmax/ppermute all have transpose rules, so the
halo-exchange convs and collective'd CAC stats train exactly like the
single-device model.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from codon_tpu.parallel.tiling import make_sharded_forward


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    loss: str = "l1"               # "l1" | "l2" (SR-standard choices)
    # >0 adds grad_weight * mean L1 error of spatial finite differences
    # (masked to pixel pairs where BOTH endpoints are valid). Gradient-
    # domain supervision sharpens depth edges — the structures masked
    # RMSE punishes most on scenes like Art (thin brushes/pencils).
    grad_weight: float = 0.0
    clip_norm: Optional[float] = None
    weight_decay: float = 0.0
    # cosine schedule: warmup_steps > 0 enables
    # warmup -> peak(learning_rate) -> cosine decay to end_lr over
    # total_steps; otherwise constant learning_rate
    warmup_steps: int = 0
    total_steps: int = 0
    end_lr_ratio: float = 0.01


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


class CollapseDetector:
    """Dead-network failure detection (SURVEY §5 failure-detection tier).

    A ReLU net can fall into a fixed point where EVERY path from the
    parameters to the output is closed — the output degenerates to the
    residual passthrough and the global grad norm is exactly 0.0 forever
    after. The r5 scale-conditioned run hit this at step ~7k and silently
    burned 16k more steps (loss stays finite at the identity level, so
    loss-based monitoring never fires). An exactly-zero global norm over
    a full float32 parameter tree is unreachable for a live network, so
    `patience` consecutive zero observations (log steps, i.e. hundreds of
    train steps apart) is a certain diagnosis, not a heuristic.
    """

    def __init__(self, patience: int = 3):
        self.patience = patience
        self.zero_streak = 0

    def update(self, grad_norm: float) -> bool:
        """Feed one observed global grad norm; True => training is dead."""
        if grad_norm == 0.0:
            self.zero_streak += 1
        else:
            self.zero_streak = 0
        return self.zero_streak >= self.patience


def make_optimizer(cfg: TrainConfig):
    parts = []
    if cfg.clip_norm:
        parts.append(optax.clip_by_global_norm(cfg.clip_norm))
    if cfg.warmup_steps > 0 and cfg.total_steps > 0:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=cfg.learning_rate * 0.01,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=cfg.total_steps,
            end_value=cfg.learning_rate * cfg.end_lr_ratio)
    elif cfg.warmup_steps > 0:
        # no total_steps -> warmup to peak, then constant (silently
        # dropping an explicitly-requested warmup invites divergence at
        # full peak LR from step 0)
        lr = optax.linear_schedule(cfg.learning_rate * 0.01,
                                   cfg.learning_rate, cfg.warmup_steps)
    else:
        lr = cfg.learning_rate
    parts.append(optax.scale_by_adam())
    if cfg.weight_decay:
        # Decoupled (AdamW-style) decay: must come BEFORE the -lr scaling
        # so the decay term is negated/scheduled along with the update
        # (after scale_by_learning_rate it would ADD +wd*params per step).
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def make_train_step(variant, cfg: TrainConfig = TrainConfig(), mesh=None,
                    donate: bool = True, ops=None):
    """Returns (step_fn, tx). step_fn(params, opt_state, batch) ->
    (params, opt_state, metrics). batch: dict with depth/color/label/mask,
    all (B, H, W, 1) float32.

    With `mesh`, the forward runs shard_map'd over (dp, sp); put batch
    arrays with NamedSharding(mesh, P('dp','sp')) for zero resharding.
    `ops`: optional Ops backend override (e.g. quant_ops.FakeQuantOps for
    QAT). With a mesh, FakeQuantOps / FakeQuantStaticOps are mapped to
    their sharded twins (per-sample dynamic scales get an sp all-reduce;
    frozen static grids need none) so the sharded QAT step matches the
    single-device one; other backends raise NotImplementedError.
    """
    tx = make_optimizer(cfg)

    if mesh is not None:
        ops_factory = None
        if ops is not None:
            # map the single-device QAT backend to its sharded twin: the
            # per-sample dynamic scales need an all-reduce over the sp
            # axis (frozen static grids need none) — see quant_ops
            from codon_tpu import quant_ops
            if isinstance(ops, quant_ops.FakeQuantStaticOps):
                scales = ops.act_scales

                def ops_factory(axis_name, **kw):
                    # the twin must match the single-device instance's
                    # numerics exactly, not the variant dtype policy's
                    # (kw carries the policy's acc_dtype/precision)
                    del kw
                    return quant_ops.FakeQuantStaticShardedOps(
                        scales, axis_name=axis_name,
                        acc_dtype=ops.acc_dtype, precision=ops.precision)
            elif isinstance(ops, quant_ops.FakeQuantOps):
                def ops_factory(axis_name, **kw):
                    del kw
                    return quant_ops.FakeQuantShardedOps(
                        axis_name, acc_dtype=ops.acc_dtype,
                        precision=ops.precision)
            else:
                raise NotImplementedError(
                    f"make_train_step: no sharded twin for ops backend "
                    f"{type(ops).__name__} — train it single-device")
        fwd = make_sharded_forward(variant, mesh, jit_compile=False,
                                   ops_factory=ops_factory)
    else:
        def fwd(params, depth, color, mask):
            return variant.forward(params, depth, color, mask=mask,
                                   ops=ops)

    def loss_fn(params, batch):
        out = fwd(params, batch["depth"], batch["color"], batch["mask"])
        m = batch["mask"]
        err = (out - batch["label"]) * m
        denom = jnp.sum(m)
        if cfg.loss == "l2":
            loss = jnp.sum(err * err) / denom
        elif cfg.loss == "l1":
            loss = jnp.sum(jnp.abs(err)) / denom
        else:
            raise ValueError(f"TrainConfig.loss must be 'l1' or 'l2', "
                             f"got {cfg.loss!r}")
        if cfg.grad_weight:
            lbl = batch["label"]
            # forward differences along H and W; a difference is valid
            # only when both its endpoint pixels are valid
            my = m[:, 1:] * m[:, :-1]
            mx = m[:, :, 1:] * m[:, :, :-1]
            ey = ((out[:, 1:] - out[:, :-1])
                  - (lbl[:, 1:] - lbl[:, :-1])) * my
            ex = ((out[:, :, 1:] - out[:, :, :-1])
                  - (lbl[:, :, 1:] - lbl[:, :, :-1])) * mx
            gdenom = jnp.maximum(jnp.sum(my) + jnp.sum(mx), 1.0)
            gloss = (jnp.sum(jnp.abs(ey)) + jnp.sum(jnp.abs(ex))) / gdenom
            loss = loss + cfg.grad_weight * gloss
        return loss

    def step_fn(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums), tx
