"""Weight-space average ("model soup") of same-architecture npz checkpoints.

Only meaningful for members in the same loss basin (e.g. a checkpoint and
its own fine-tunes: gl10 was 20k steps from holdout2, the l2/p128 polishes
are further fine-tunes of gl10). Averaging improves the PLAIN path when the
members' errors decorrelate, at zero serving cost — unlike output-space
ensembling, which multiplies compute per image.

Usage:
  python scripts/soup.py OUT.npz IN1.npz IN2.npz [IN3.npz ...] [--w 2,1,1]

Non-float leaves (e.g. shipped int8 act_scales trees) must agree across
members and are taken from the first; float leaves are averaged.
"""
import argparse
import sys

import numpy as np

# host-side weight averaging: never claim the (single-client) TPU — a
# second axon client blocks behind a live training chain indefinitely
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
from codon_tpu.checkpoint import load_npz, save_npz  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("members", nargs="+")
    ap.add_argument("--w", default=None,
                    help="comma-separated member weights (default: uniform)")
    args = ap.parse_args()

    trees = [load_npz(p) for p in args.members]
    if args.w:
        w = np.array([float(x) for x in args.w.split(",")], dtype=np.float64)
        if len(w) != len(trees):
            raise SystemExit(f"--w has {len(w)} entries for "
                             f"{len(trees)} members")
        if not ((w >= 0).all() and w.sum() > 0):
            raise SystemExit(f"--w weights must be >= 0 with a positive "
                             f"sum, got {w.tolist()}")
    else:
        w = np.ones(len(trees), dtype=np.float64)
    w = w / w.sum()

    import jax.tree_util as jtu
    leaves0, treedef = jtu.tree_flatten(trees[0])
    rest = []
    for t in trees[1:]:
        leaves, td = jtu.tree_flatten(t)
        if td != treedef:
            raise SystemExit("member tree structures differ — same "
                             "architecture required")
        rest.append(leaves)

    out_leaves = []
    for i, leaf in enumerate(leaves0):
        arrs = [np.asarray(leaf)] + [np.asarray(ls[i]) for ls in rest]
        for a in arrs[1:]:
            # identical treedefs still allow broadcastable float leaves
            # ((C,) vs (1,C)) or dtype drift to average into a silently
            # corrupt checkpoint
            if a.shape != arrs[0].shape or a.dtype != arrs[0].dtype:
                raise SystemExit(
                    f"leaf {i}: shape/dtype mismatch across members "
                    f"({arrs[0].shape}/{arrs[0].dtype} vs "
                    f"{a.shape}/{a.dtype})")
        if not np.issubdtype(arrs[0].dtype, np.floating):
            for a in arrs[1:]:
                if not np.array_equal(arrs[0], a):
                    raise SystemExit("non-float leaf differs across members")
            out_leaves.append(arrs[0])
            continue
        acc = sum(wi * a.astype(np.float64) for wi, a in zip(w, arrs))
        out_leaves.append(acc.astype(arrs[0].dtype))

    save_npz(args.out, jtu.tree_unflatten(treedef, out_leaves))
    print(f"soup({len(trees)} members, w={w.round(3).tolist()}) "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
