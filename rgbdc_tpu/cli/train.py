"""Train CLI (reference playground/train.py): dispatch a trainer by
--channel and model-name substring, then fit."""

import sys

from ..training.trainer import TrainerConcat, TrainerSingle, TrainerUnited
from ..utils.config import mlic_model_config, model_config, tiny_model_config
from .args import train_options


def pick_trainer(args):
    if args.channel == 4:
        if "united" in args.model:
            return TrainerUnited
        if "master" in args.model:
            from ..training.trainer_master import TrainerMaster

            return TrainerMaster
        return TrainerConcat
    if "master" in args.model:
        from ..training.trainer_master import TrainerMaster

        return TrainerMaster
    return TrainerSingle


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = train_options(argv)
    if getattr(args, "tiny", False):
        config = tiny_model_config()
    elif "MLIC" in args.model:
        config = mlic_model_config()
    else:
        config = model_config()
    trainer_cls = pick_trainer(args)
    trainer = trainer_cls(args, config)
    if getattr(args, "git", False):
        import subprocess

        subprocess.run(["git", "add", "-A"], check=False)
        subprocess.run(
            ["git", "commit", "-m", f"experiment: {trainer.exp_name}"], check=False
        )
    trainer.fit(
        seed=args.seed,
        auto_restore=args.auto_restore,
        ckpt_path=args.checkpoint,
        restore_epoch=args.start_epoch,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
