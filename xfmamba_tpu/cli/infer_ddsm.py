"""CBIS-DDSM inference CLI — counterpart of
``/root/reference/2_inference_ddsmxray.py``.

Two evaluation passes — plain and ROI-mask-overlay (the reference zips two
test loaders, :146-148) — softmax[:, 1] probabilities and ROC/AUC artifacts.
The reference script crashes on a stale ``mvswintransformermodels`` import
(:23, SURVEY.md §2.9); this CLI is its working equivalent.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from xfmamba_tpu.cli import (
    build_model_by_name, collect_scores, load_variables, make_eval_apply,
    write_roc_artifacts)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="XFMamba CBIS-DDSM inference")
    p.add_argument("--model_name", default="twoviewxfmamba")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--pretrained_model_path", default=None)
    p.add_argument("--base_dir", required=True,
                   help="CBIS-DDSM root containing the DICOM tree")
    p.add_argument("--metadata_csv", required=True)
    p.add_argument("--case_csvs", nargs="+", required=True,
                   help="mass/calc case description CSVs")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--crop", type=int, default=0, help="NYU breast crop")
    p.add_argument("--rescale_factor", type=float, default=None)
    p.add_argument("--overlay_pass", type=int, default=1,
                   help="also evaluate the ROI-overlay variant")
    p.add_argument("--out_dir", default="inference_ddsm")
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
    apply_fn = make_eval_apply(model, variables, two_view)

    from xfmamba_tpu.data.ddsm import (
        create_data_loaders, load_subjects, make_load_fn, reference_split)
    from xfmamba_tpu.data.loader import TwoViewLoader, TwoViewSamples
    from xfmamba_tpu.data.transforms import TwoViewTransform

    cfg_dict = dict(seed=args.seed, image_size=(sz, sz),
                    batch_size=args.batch_size,
                    eval_batch_size=args.batch_size,
                    num_workers=args.num_workers)

    os.makedirs(args.out_dir, exist_ok=True)
    results = {}
    passes = [("plain", False)]
    if args.overlay_pass:
        passes.append(("overlay", True))
    for tag, overlay in passes:
        subjects = load_subjects(args.case_csvs, args.metadata_csv,
                                 args.base_dir)
        _, test_idx = reference_split(subjects)
        et = TwoViewTransform((sz, sz), train=False, normalize_mean=None,
                              normalize_std=None)
        load = make_load_fn(subjects, crop=bool(args.crop),
                            rescale_factor=args.rescale_factor,
                            overlay_mask=overlay)
        loader = TwoViewLoader(TwoViewSamples(test_idx, load, et),
                               args.batch_size, shuffle=False,
                               num_workers=args.num_workers, seed=args.seed)
        labels, probs, _ = collect_scores(apply_fn, loader, binary=True)
        if len(np.unique(labels)) < 2:
            print(f"{tag}: single-class fold, skipping AUC")
            continue
        auc = write_roc_artifacts(args.out_dir, tag, labels, probs)
        print(f"{tag}: AUC={auc:.4f} (n={len(labels)})")
        results[tag] = auc
    return results


if __name__ == "__main__":
    main()
