"""CheXpert inference CLI — counterpart of
``/root/reference/2_inference_chexpert.py``.

Rebuilds the seeded 75/12.5/12.5 split to obtain the test fold (:110-117),
sigmoid probabilities with per-class + mean AUC over the 14 (or 13 with
``--drop_no_finding``) labels (:123-128, :270-280), and the detailed timing
stats + FPS report written to ``inference_timing.txt`` (:233-266).
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from xfmamba_tpu.cli import (
    CHEXPERT_LABELS, build_model_by_name, collect_scores, load_variables,
    make_eval_apply, write_roc_artifacts)
from xfmamba_tpu.utils.profiling import format_timing_report, timing_stats


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="XFMamba CheXpert inference")
    p.add_argument("--model_name", default="twoviewxfmamba")
    p.add_argument("--num_classes", type=int, default=14)
    p.add_argument("--drop_no_finding", type=int, default=0,
                   help="13-class protocol (README vs code mismatch, "
                        "SURVEY.md §6)")
    p.add_argument("--pretrained_model_path", default=None)
    p.add_argument("--data_root", required=True)
    p.add_argument("--csv_file", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_dir", default="inference_chexpert")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--bf16", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    n_classes = 13 if args.drop_no_finding else args.num_classes
    model, two_view = build_model_by_name(args.model_name, n_classes, dtype)

    sz = args.image_size
    x1 = jnp.zeros((1, sz, sz, 1), dtype)
    x2 = jnp.zeros((1, sz, sz, 1), dtype)
    if args.pretrained_model_path:
        variables = load_variables(args.pretrained_model_path)
    else:
        import jax
        variables = model.init(jax.random.key(args.seed), x1, x2)
        variables = {k: variables[k] for k in ("params", "batch_stats")
                     if k in variables}
        print("WARNING: no checkpoint given; using random init")
    apply_fn = make_eval_apply(model, variables, two_view)

    from xfmamba_tpu.data.chexpert import create_train_val_test_data_loaders
    cfg_dict = dict(seed=args.seed, image_size=(sz, sz),
                    batch_size=args.batch_size,
                    eval_batch_size=args.batch_size,
                    num_workers=args.num_workers)
    _, _, test_loader = create_train_val_test_data_loaders(
        [args.data_root], [args.csv_file], cfg_dict,
        drop_no_finding=bool(args.drop_no_finding))

    labels, probs, times = collect_scores(apply_fn, test_loader,
                                          binary=False)

    os.makedirs(args.out_dir, exist_ok=True)
    label_names = ([n for n in CHEXPERT_LABELS if n != "No Finding"]
                   if args.drop_no_finding else CHEXPERT_LABELS)
    label_names = label_names[:n_classes]
    from xfmamba_tpu.train.metrics import roc_auc
    per_class = {}
    for i, name in enumerate(label_names):
        col_labels = labels[:, i]
        if len(np.unique(col_labels > 0.5)) < 2:
            continue
        per_class[name] = roc_auc((col_labels > 0.5).astype(int),
                                  probs[:, i])
        write_roc_artifacts(args.out_dir, name.replace(" ", "_"),
                            (col_labels > 0.5).astype(int), probs[:, i])
    mean_auc = float(np.mean(list(per_class.values()))) if per_class \
        else float("nan")
    with open(os.path.join(args.out_dir, "per_class_auc.txt"), "w") as f:
        for name, auc in per_class.items():
            f.write(f"{name}: {auc:.6f}\n")
        f.write(f"\nmean AUC ({len(per_class)} classes): {mean_auc:.6f}\n")
    print(f"mean AUC over {len(per_class)} classes: {mean_auc:.4f}")

    stats = timing_stats(times, batch_size=args.batch_size)
    report = format_timing_report(stats, header="CheXpert inference timing")
    with open(os.path.join(args.out_dir, "inference_timing.txt"), "w") as f:
        f.write(report + "\n")
    print(report)
    return {"mean_auc": mean_auc, "per_class": per_class, "timing": stats}


if __name__ == "__main__":
    main()
