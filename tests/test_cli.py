import json
from pathlib import Path

import numpy as np
import pytest

from rgbdc_tpu.cli.args import test_options as eval_options
from rgbdc_tpu.cli.args import train_options
from rgbdc_tpu.cli.train import pick_trainer
from rgbdc_tpu.cli.test import pick_tester
from rgbdc_tpu.training.trainer import TrainerConcat, TrainerSingle, TrainerUnited
from rgbdc_tpu.eval.tester import TesterConcat, TesterSingle, TesterUnited


class TestArgSurface:
    def test_train_flags_parity(self):
        args = train_options(
            ["-m", "ELIC_united", "-ch", "4", "-q", "2_2", "--batch-size", "4",
             "-e", "1", "-lr", "1e-4", "--save", "--seed", "42"]
        )
        assert args.model == "ELIC_united"
        assert args.channel == 4
        assert args.quality == "2_2"
        assert args.batch_size == 4
        assert args.seed == 42
        assert args.aux_learning_rate == 1e-3

    def test_test_flags(self):
        args = eval_options(["-m", "ELIC", "--channel", "3", "-q", "2"])
        assert args.model == "ELIC" and args.channel == 3

    def test_trainer_dispatch(self):
        a = train_options(["-m", "ELIC_united", "-ch", "4"])
        assert pick_trainer(a) is TrainerUnited
        a = train_options(["-m", "ELIC", "-ch", "4"])
        assert pick_trainer(a) is TrainerConcat
        a = train_options(["-m", "ELIC", "-ch", "3"])
        assert pick_trainer(a) is TrainerSingle

    def test_tester_dispatch(self):
        a = eval_options(["-m", "ELIC_united", "--channel", "4"])
        assert pick_tester(a) is TesterUnited
        a = eval_options(["-m", "ELIC", "--channel", "4"])
        assert pick_tester(a) is TesterConcat
        a = eval_options(["-m", "ELIC", "--channel", "1"])
        assert pick_tester(a) is TesterSingle


class TestTrainerFit:
    @pytest.mark.full
    def test_single_modal_fit_smoke(self, tmp_path, monkeypatch):
        """One debug epoch of TrainerSingle on tiny synthetic data: the fit
        loop trains, validates, and writes latest/best checkpoints."""
        from rgbdc_tpu.data import SyntheticRGBD
        import rgbdc_tpu.training.trainer as trainer_mod

        args = train_options(
            ["--tiny", "--synthetic-data", "--debug", "-m", "ELIC", "-ch", "3",
             "-q", "2", "--batch-size", "2", "-e", "1"]
        )
        args.experiments_dir = str(tmp_path)
        from rgbdc_tpu.utils.config import tiny_model_config

        monkeypatch.setattr(
            trainer_mod,
            "SyntheticRGBD",
            lambda n, size, channel, seed=0: SyntheticRGBD(
                n=4, size=64, channel=channel, seed=seed
            ),
        )
        t = TrainerSingle(args, tiny_model_config())
        t.epochs = 1
        t.fit(seed=0)
        ckpts = list(Path(t.ckpt_dir).glob("*"))
        # debug mode deletes checkpoints at the end (reference behavior)
        assert ckpts == []
        log_files = list(Path(t.exp_dir, "logs").glob("*.log"))
        assert log_files
