"""Export a trained checkpoint to a torch reference state_dict (.pth).

The inverse last-mile of ``torch_import``: users who train HERE can drop
the weights straight back into the reference's ``nets/yolo.Model``
(its ``detect.py:175`` ``load_state_dict`` path). The EMA tree is
exported by default — it is what our own eval/serving uses.

Usage:
    python -m yolo_continuous_tpu.tools.torch_export plan.yaml out.pth
    python -m yolo_continuous_tpu.tools.torch_export plan.yaml out.pth --raw
"""
from __future__ import annotations

import argparse


def export_checkpoint(plan, out_path: str, use_ema: bool = True) -> dict:
    """Load the plan's checkpoint and write a torch .pth; returns the
    exported state_dict (numpy arrays)."""
    import jax
    import torch

    from ..train.checkpoint import try_load
    from ..train.train_loop import Trainer
    from .torch_import import export_state_dict

    tr = Trainer(plan)
    state = tr.init_state(jax.random.PRNGKey(0))
    loaded = try_load(plan.save_path, state)
    if loaded is None:
        raise FileNotFoundError(f"no checkpoint at {plan.save_path}")
    if use_ema:
        tree = loaded["ema"].tree
        params, batch_stats = tree["params"], tree["batch_stats"]
    else:
        params, batch_stats = loaded["params"], loaded["batch_stats"]
    sd = export_state_dict(tr.spec, params, batch_stats)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
               out_path)
    return sd


def main():
    import os

    ap = argparse.ArgumentParser(
        description="Export a checkpoint as a torch reference state_dict")
    ap.add_argument("cfg", help="train-plan YAML (locates the checkpoint)")
    ap.add_argument("out", help="output .pth path")
    ap.add_argument("--raw", action="store_true",
                    help="export the raw params instead of the EMA tree")
    ap.add_argument("--device",
                    default=os.environ.get("JAX_PLATFORMS", "").strip())
    args = ap.parse_args()
    if args.device:
        from ..utils.timing import select_device
        select_device(args.device)

    from ..config.plan import TrainPlan, check_file
    plan = TrainPlan(check_file(args.cfg))
    sd = export_checkpoint(plan, args.out, use_ema=not args.raw)
    print(f"exported {len(sd)} tensors "
          f"({'EMA' if not args.raw else 'raw'}) -> {args.out}")


if __name__ == "__main__":
    main()
