"""Argparse flag surface — mirrors reference config/args.py:4-75 so users of
the reference CLI find the same switches."""

import argparse


def train_options(argv=None):
    p = argparse.ArgumentParser(description="train a TPU-native RGB-D codec")
    p.add_argument("-exp", "--experiment", type=str, default="", help="experiment name")
    p.add_argument("-m", "--model", type=str, default="ELIC_united", help="model name")
    p.add_argument("-d", "--dataset_path", type=str, default=None, help="train root")
    p.add_argument("-vd", "--val_dataset_path", type=str, default=None)
    p.add_argument("-e", "--epochs", type=int, default=400)
    p.add_argument("-wr", "--warmup_step", type=int, default=0)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("-ch", "--channel", type=int, default=4, choices=[1, 3, 4])
    p.add_argument("-lr", "--lr", dest="lr", type=float, default=1e-4)
    p.add_argument("--lr_scheduler", type=str, default="multistep",
                   choices=["multistep", "plateau"])
    p.add_argument("-n", "--num-workers", type=int, default=8)
    p.add_argument("--metrics", type=str, default="mse", choices=["mse", "ms-ssim"])
    p.add_argument("--distortionLossForDepth", type=str, default="d_loss")
    p.add_argument("-q", "--quality", type=str, default="2_2",
                   help="int for single-modal; 'r_d' pair (may be fractional) for united")
    p.add_argument("--batch-size", dest="batch_size", type=int, default=16)
    p.add_argument("--test-batch-size", dest="test_batch_size", type=int, default=1)
    p.add_argument("--aux-learning-rate", dest="aux_learning_rate", type=float,
                   default=1e-3)
    p.add_argument("--patch-size", dest="patch_size", type=int, nargs=2,
                   default=(256, 256))
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--save", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=1926)
    p.add_argument("-c", "--checkpoint", type=str, default=None)
    p.add_argument("-c1", "--checkpoint_aux", type=str, default=None,
                   help="aux codec ckpt for the master cascade")
    p.add_argument("--git", action="store_true",
                   help="git add/commit the working tree per experiment "
                        "(reference playground/train.py gitIt)")
    p.add_argument("--auto_restore", action="store_true")
    p.add_argument("--dist", action="store_true", help="data-parallel over the mesh")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--synthetic-data", dest="synthetic_data", action="store_true",
                   help="use the deterministic synthetic RGB-D fixture")
    p.add_argument("--tiny", action="store_true",
                   help="scaled-down model config (smoke tests)")
    return p.parse_args(argv)


def test_options(argv=None):
    p = argparse.ArgumentParser(description="evaluate a TPU-native RGB-D codec")
    p.add_argument("-exp", "--experiment", type=str, default="")
    p.add_argument("--channel", type=int, default=4, choices=[1, 3, 4])
    p.add_argument("-d", "--dataset_path", type=str, default=None, help="test root")
    p.add_argument("-m", "--model", type=str, default="ELIC_united")
    p.add_argument("-n", "--num-workers", type=int, default=1)
    p.add_argument("--metrics", type=str, default="mse")
    p.add_argument("--test-batch-size", dest="test_batch_size", type=int, default=1)
    p.add_argument("-q", "--quality", type=str, default="2_2")
    p.add_argument("-c", "--checkpoint", type=str, default=None)
    p.add_argument("-c1", "--checkpoint_aux", type=str, default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--synthetic-data", dest="synthetic_data", action="store_true")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)
