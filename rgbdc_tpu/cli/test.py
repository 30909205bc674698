"""Test CLI (reference playground/test.py): dispatch a tester by --channel
and model-name substring, run the real codec round-trip over a test set."""

import faulthandler
import sys

from ..eval.tester import TesterConcat, TesterSingle, TesterUnited
from ..utils.config import mlic_model_config, model_config, tiny_model_config
from .args import test_options


def pick_tester(args):
    if args.channel == 4:
        if "united" in args.model:
            return TesterUnited
        if "master" in args.model:
            from ..eval.tester_master import TesterMaster

            return TesterMaster
        return TesterConcat
    if "master" in args.model:
        from ..eval.tester_master import TesterMaster

        return TesterMaster
    return TesterSingle


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    faulthandler.enable()
    args = test_options(argv)
    if getattr(args, "tiny", False):
        config = tiny_model_config()
    elif "MLIC" in args.model:
        config = mlic_model_config()
    else:
        config = model_config()
    tester = pick_tester(args)(args, config)
    return tester.test_model(padding_mode="replicate0", padding=True)


if __name__ == "__main__":
    main(sys.argv[1:])
