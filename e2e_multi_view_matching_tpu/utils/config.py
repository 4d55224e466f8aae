"""Argparse flags and dataset-conditional defaults.

Reproduces the reference's flag surface (`/root/reference/helpers.py:15-20`) and
the dataset-conditional hyperparameter blocks (`train.py:174-268` -- SURVEY.md
section 2.1 requires these to be carried exactly).
"""

import os


def add_generic_arguments(parser):
    parser.add_argument("--data_dir", type=str, default=None,
                        help="path to directory containing dataset")
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="path to directory containing checkpoints")
    parser.add_argument("--dataset", type=str, default="scannet", help="dataset")
    parser.add_argument("--tuple_size", type=int, default=5,
                        help="number of images to be matched")
    # TPU kernel selection (no reference analog): "pallas" attention (fused
    # in-kernel-masked, REAL flash backward since round 4) and "pallas"
    # Sinkhorn (VMEM-resident scaling domain, 9.7x the XLA log scan at the
    # eval shape, real reverse-sweep backward kernel) are the measured-faster
    # paths both in eval AND training (B=8 bf16 train step 383 -> 257 ms,
    # BASELINE.md round 4), and are the DEFAULT. They match XLA to f32
    # reduction-order noise (~4e-4 attention, ~2e-4 Sinkhorn probabilities);
    # pass "xla" for the bitwise compiler paths ("mxu" = XLA scaling-domain
    # Sinkhorn middle ground).
    # The default "auto" resolves to pallas on TPU and xla elsewhere (the
    # kernels fall back to the slow interpreter off-TPU).
    parser.add_argument("--attention_impl", type=str, default="auto",
                        choices=["auto", "xla", "pallas"],
                        help="matcher attention kernel (pallas = fused masked)")
    parser.add_argument("--sinkhorn_impl", type=str, default="auto",
                        choices=["auto", "xla", "mxu", "pallas"],
                        help="Sinkhorn kernel (mxu = scaling-domain matvecs)")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="SuperPoint-trunk / matcher matmul compute dtype "
                             "(params and Sinkhorn stay f32). bfloat16 wins at "
                             "batch on the MXU (BASELINE.md); float32 = "
                             "reference semantics")
    return parser


def get_exp_dir(checkpoint_dir, exp_name):
    exp_dir = os.path.join(checkpoint_dir, exp_name)
    return exp_dir, os.path.join(exp_dir, "cfg.json")


def resolve_kernel_impls(opt):
    """Resolve the "auto" kernel selections: pallas on TPU, xla elsewhere."""
    import jax

    on_tpu = jax.default_backend() == "tpu"
    if getattr(opt, "attention_impl", "auto") == "auto":
        opt.attention_impl = "pallas" if on_tpu else "xla"
    if getattr(opt, "sinkhorn_impl", "auto") == "auto":
        opt.sinkhorn_impl = "pallas" if on_tpu else "xla"
    return opt


def apply_dataset_defaults(opt):
    """Dataset-conditional hyperparameters (`train.py:174-268`), mutated onto opt."""
    resolve_kernel_impls(opt)
    ds = opt.dataset
    if "scannet" in ds:
        opt.remove_borders = 12
        opt.max_keypoints = 400
        opt.nms_radius = 4
        opt.keypoint_threshold = 0.001
        opt.n_samples = 200
        opt.match_reproj_err = 5.0
        opt.unmatch_reproj_err = 15.0
        opt.start_decay = 1e5
        opt.end_decay = 9e5
        opt.color_jitter = 0.2
    elif "matterport" in ds:
        opt.remove_borders = 4
        opt.max_keypoints = 400
        opt.nms_radius = 4
        opt.keypoint_threshold = 0.001
        opt.n_samples = None  # adapt to scene size
        opt.match_reproj_err = 5.0
        opt.unmatch_reproj_err = 15.0
        opt.start_decay = 1e5
        opt.end_decay = 9e5
        opt.color_jitter = 0.2
    elif "megadepth" in ds:
        opt.remove_borders = 0
        opt.max_keypoints = 1024
        opt.nms_radius = 3
        opt.keypoint_threshold = 0.005
        opt.n_samples = 100 if opt.tuple_size > 2 else 200
        opt.match_reproj_err = 5.0
        opt.unmatch_reproj_err = 10.0
        opt.start_decay = 5e4
        opt.end_decay = 9e5
        opt.color_jitter = None
    else:
        raise ValueError(f"Dataset {ds} is not supported.")

    # pose-loss weights per dataset + tuple size (`train.py:218-254`)
    pose_weights = {
        ("scannet", 2): (1597.0, 270.0),
        ("scannet", 5): (726.0, 244.0),
        ("matterport", 2): (717.0, 591.0),
        ("matterport", 5): (240.0, 263.0),
        ("megadepth", 2): (710.0, 348.0),
        ("megadepth", 5): (661.0, 366.0),
    }
    if getattr(opt, "pose_loss", False):
        base = next(k for k in ("scannet", "matterport", "megadepth") if k in ds)
        key = (base, opt.tuple_size)
        if key not in pose_weights:
            raise ValueError(
                f"Specify rot/trans loss weights for tuple size {opt.tuple_size}"
            )
        opt.rot_weight, opt.trans_weight = pose_weights[key]
        opt.grad_clip = 0.1  # `train.py:256-260`
    else:
        opt.rot_weight = 0.0
        opt.trans_weight = 0.0
        opt.grad_clip = -1.0

    # GNN depth schedule (`train.py:262-268`)
    if opt.tuple_size > 2 and ("scannet" in ds or "matterport" in ds):
        opt.gnn_layers = 7
        opt.cross_attention_layers = 3
    else:
        opt.gnn_layers = 9
        opt.cross_attention_layers = 1
    return opt
