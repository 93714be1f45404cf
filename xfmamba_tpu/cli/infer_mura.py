"""MURA inference CLI — counterpart of ``/root/reference/2_inference_mura.py``.

Per-body-part sweep over the 7 MURA parts (:154-260), softmax[:, 1] probs,
per-part + combined ROC/AUC artifacts (:263-324), ``--cal_flops``
(:123-131), and Grad-CAM saliency export (the reference's GradCAM wiring,
:109-121).
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from xfmamba_tpu.cli import (
    MURA_BODY_PARTS, build_model_by_name, collect_scores, load_variables,
    make_eval_apply, write_roc_artifacts)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="XFMamba MURA inference")
    p.add_argument("--model_name", default="twoviewxfmamba")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--pretrained_model_path", required=False, default=None)
    p.add_argument("--data_root", default="")
    p.add_argument("--train_image_csv", default=None)
    p.add_argument("--train_label_csv", default=None)
    p.add_argument("--valid_image_csv", required=True)
    p.add_argument("--valid_label_csv", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_dir", default="inference_mura")
    p.add_argument("--cal_flops", type=int, default=0)
    p.add_argument("--gradcam", type=int, default=0,
                   help="export Grad-CAM heatmaps for the first test batch")
    p.add_argument("--body_parts", nargs="*", default=MURA_BODY_PARTS)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--bf16", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model, two_view = build_model_by_name(args.model_name, args.num_classes,
                                          dtype)

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

    if args.cal_flops:
        from xfmamba_tpu.utils.flops import model_flops
        out = model_flops(model, variables, x1, x2)
        print(f"params: {out['params'] / 1e6:.2f} M")
        print(f"flops : {out['flops'] / 1e9:.2f} GFLOPs (batch 1)")
        return out

    apply_fn = make_eval_apply(model, variables, two_view)

    from xfmamba_tpu.data.mura import create_data_loaders
    cfg_dict = dict(root_dir=args.data_root, seed=args.seed,
                    image_size=(sz, sz), batch_size=args.batch_size,
                    eval_batch_size=args.batch_size,
                    num_workers=args.num_workers)

    os.makedirs(args.out_dir, exist_ok=True)
    all_labels, all_probs = [], []
    aucs = {}
    for part in args.body_parts:
        _, _, test_loader = create_data_loaders(
            args.train_image_csv or args.valid_image_csv,
            args.train_label_csv or args.valid_label_csv,
            args.valid_image_csv, args.valid_label_csv, cfg_dict,
            body_part=part)
        labels, probs, _ = collect_scores(apply_fn, test_loader, binary=True)
        if len(np.unique(labels)) < 2:
            print(f"{part}: single-class fold, skipping AUC")
            continue
        aucs[part] = write_roc_artifacts(args.out_dir, part, labels, probs)
        print(f"{part}: AUC={aucs[part]:.4f} (n={len(labels)})")
        all_labels.append(labels)
        all_probs.append(probs)

    if all_labels:
        labels = np.concatenate(all_labels)
        probs = np.concatenate(all_probs)
        combined = write_roc_artifacts(args.out_dir, "combined", labels,
                                       probs)
        print(f"combined AUC: {combined:.4f} (n={len(labels)})")
        aucs["combined"] = combined

    if args.gradcam:
        from xfmamba_tpu.utils.saliency import grad_cam_two_view
        _, _, test_loader = create_data_loaders(
            args.valid_image_csv, args.valid_label_csv,
            args.valid_image_csv, args.valid_label_csv, cfg_dict)
        batch = next(iter(test_loader))
        cam_a, cam_b = grad_cam_two_view(
            model, variables, jnp.asarray(batch["image1"]),
            jnp.asarray(batch["image2"]), class_idx=1)
        np.savez(os.path.join(args.out_dir, "gradcam.npz"),
                 cam_a=np.asarray(cam_a), cam_b=np.asarray(cam_b),
                 image1=batch["image1"], image2=batch["image2"])
        print(f"Grad-CAM saved to {args.out_dir}/gradcam.npz")
        # heatmap-on-image overlay PNGs (the reference's gated plot path,
        # `2_inference_mura.py:189-252`), rendered via the red-highlight
        # blend in utils.saliency.overlay
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            from xfmamba_tpu.utils.saliency import overlay
            n_show = min(8, cam_a.shape[0])
            for i in range(n_show):
                fig, axes = plt.subplots(1, 2, figsize=(8, 4))
                for ax, img, cam, name in (
                        (axes[0], batch["image1"][i, ..., 0], cam_a[i],
                         "view A"),
                        (axes[1], batch["image2"][i, ..., 0], cam_b[i],
                         "view B")):
                    # inputs are Normalize()d; min-max back to [0,1] for
                    # display (as the reference's plot path does)
                    img = np.asarray(img, np.float32)
                    span = img.max() - img.min()
                    img = (img - img.min()) / (span if span > 0 else 1.0)
                    ax.imshow(np.asarray(overlay(jnp.asarray(img),
                                                 jnp.asarray(cam))))
                    ax.set_title(f"Grad-CAM {name}")
                    ax.axis("off")
                fig.tight_layout()
                fig.savefig(os.path.join(args.out_dir,
                                         f"gradcam_overlay_{i}.png"),
                            dpi=120)
                plt.close(fig)
            print(f"Grad-CAM overlays saved to {args.out_dir}/"
                  f"gradcam_overlay_*.png ({n_show} samples)")
        except Exception as e:  # matplotlib optional, npz already written
            print(f"Grad-CAM overlay rendering skipped: {e}")
    return aucs


if __name__ == "__main__":
    main()
