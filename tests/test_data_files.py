"""Real-file data pipeline tests over committed PNG fixtures.

tests/fixtures/rgbd holds 3 genuine image pairs (8-bit RGB + depth PNGs
written by Pillow) in BOTH directory layouts the reference uses:
train-style {color/,gt/} (dataset/trainDataset.py) and test-style
{rgb/,depth/} (dataset/testDataset.py).  The depth files cover all three
scale regimes the auto-detection must distinguish
(testDataset.py:50-55):

  0001.png  uint16, max in (255, 10000)  -> scale 10000 (NYUv2)
  0002.png  uint16, max >= 10000         -> scale 100000 (SUN-RGBD)
  0003.png  uint8,  max < 255            -> scale 255

Also the TesterMaster end-to-end cascade (aux roundtrip -> conditioned
master decode -> side-info bpp), per reference testing/tester_master.py.
"""

import types
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from rgbdc_tpu.data import (
    BaseDataset,
    DataLoader,
    ImageFolder,
    ImageFolderUnited,
    NYUv2Dataset,
)
from rgbdc_tpu.data.datasets import _auto_depth_scale
from rgbdc_tpu.utils.config import tiny_model_config

FIXTURES = Path(__file__).parent / "fixtures" / "rgbd"


class TestDepthScaleAutoDetect:
    def test_raw_file_regimes(self):
        expected = {"0001": 10000.0, "0002": 100000.0, "0003": 255.0}
        for stem, scale in expected.items():
            d = np.asarray(Image.open(FIXTURES / "depth" / f"{stem}.png"))
            d = d.astype(np.float32)
            assert _auto_depth_scale(d) == scale, stem

    def test_image_folder_normalizes_each_regime(self):
        ds = ImageFolder(str(FIXTURES), channel=1)
        assert len(ds) == 3
        for i in range(3):
            img, stem = ds[i]
            assert img.shape == (192, 192, 1)
            assert img.dtype == np.float32
            # every regime must land in [0, 1] after its detected scale
            assert 0.0 <= img.min() and img.max() <= 1.0, stem
            assert img.max() > 0.01, f"{stem} collapsed to ~0 (wrong scale)"

    def test_rgb_folder(self):
        ds = ImageFolder(str(FIXTURES), channel=3)
        img, stem = ds[0]
        assert img.shape == (192, 192, 3) and stem == "0001"
        assert 0.0 <= img.min() and img.max() <= 1.0


class TestBaseDatasetRealFiles:
    def test_train_crop_flip_pair(self):
        ds = NYUv2Dataset(str(FIXTURES), is_train=True, channel=4)
        ds.patch_size = 128
        assert len(ds) == 3
        rng = np.random.default_rng(0)
        rgb, depth = ds.get(0, rng)
        assert rgb.shape == (128, 128, 3) and depth.shape == (128, 128, 1)
        # NYU file 0001: uint16/10000 -> strictly inside (0, 1)
        assert 0.0 < depth.min() and depth.max() < 1.0

    def test_val_center_crop(self):
        ds = NYUv2Dataset(str(FIXTURES), is_train=False, channel=4)
        ds.val_crop = (160, 160)
        rgb, depth = ds.get(0, np.random.default_rng(0))
        assert rgb.shape == (160, 160, 3) and depth.shape == (160, 160, 1)

    def test_depth_only_channel(self):
        ds = BaseDataset(str(FIXTURES), is_train=False, channel=1)
        ds.val_crop = (96, 96)
        (depth,) = ds.get(2, np.random.default_rng(0))
        # 8-bit file -> /255 path
        assert depth.shape == (96, 96, 1) and depth.max() <= 1.0

    def test_dataloader_batches_real_files(self):
        ds = NYUv2Dataset(str(FIXTURES), is_train=True, channel=4)
        ds.patch_size = 64
        loader = DataLoader(ds, batch_size=3, shuffle=True, seed=1)
        batches = list(loader)
        assert len(batches) == 1
        rgb, depth = batches[0]
        assert rgb.shape == (3, 64, 64, 3) and depth.shape == (3, 64, 64, 1)
        assert rgb.dtype == np.float32


class TestImageFolderUnitedRealFiles:
    def test_index_aligned_pairs(self):
        ds = ImageFolderUnited(str(FIXTURES))
        assert len(ds) == 3
        rgb, depth, rname, dname = ds[1]
        assert rname == dname == "0002"
        assert rgb.shape == (192, 192, 3) and depth.shape == (192, 192, 1)
        # SUN-regime file scaled by 100000
        assert depth.max() <= 1.0


def _args(root, exp_dir, model, channel):
    return types.SimpleNamespace(
        model=model,
        channel=channel,
        dataset_path=str(root),
        quality="2" if channel != 4 else "2_2",
        checkpoint=None,
        checkpoint_aux=None,
        debug=False,
        experiment="t",
        experiments_dir=str(exp_dir),
    )


class TestTesterUnitedRealFiles:
    def test_end_to_end_on_fixture_images(self, tmp_path):
        from rgbdc_tpu.eval.tester import TesterUnited

        tester = TesterUnited(
            _args(FIXTURES, tmp_path, "ELIC_united", 4), tiny_model_config()
        )
        res = tester.test_model()
        assert np.isfinite(res["r_psnr"]) and np.isfinite(res["d_psnr"])
        assert res["r_bpp"] > 0 and res["d_bpp"] > 0
        assert len(list(tester.stream_dir.glob("*_rgb.bin"))) == 3
        assert len(list(tester.rec_dir.glob("*depth.16bit.png"))) == 3


class TestTesterMasterCascade:
    @pytest.mark.full
    def test_full_cascade_end_to_end(self, tmp_path):
        """aux roundtrip -> master conditioned on DECODED aux -> side-info
        written into and charged against the master bitstream file."""
        from rgbdc_tpu.coder import read_body, read_uints
        from rgbdc_tpu.eval.tester_master import TesterMaster

        tester = TesterMaster(
            _args(FIXTURES, tmp_path, "ELIC_master", 3), tiny_model_config()
        )
        res = tester.test_model()
        for k in ("psnr", "msssim", "bpp", "aux_psnr", "aux_bpp"):
            assert np.isfinite(res[k]), k
        assert res["bpp"] > 0 and res["aux_bpp"] > 0

        masters = sorted(tester.stream_dir.glob("*_master.bin"))
        auxes = sorted(tester.stream_dir.glob("*_aux.bin"))
        assert len(masters) == 3 and len(auxes) == 3

        # the master container ends with 256 bytes of f16 beta/gamma and
        # those bytes are part of the charged file size (see the accounting
        # note in eval/tester_master.py)
        with open(masters[0], "rb") as f:
            h, w = read_uints(f, 2)
            strings, shape = read_body(f)
            side = f.read()
        assert (h, w) == (192, 192)
        assert len(side) == 256
        beta = np.frombuffer(side[:128], dtype=np.float16)
        gamma = np.frombuffer(side[128:], dtype=np.float16)
        assert beta.shape == (64,) and gamma.shape == (64,)
        assert np.isfinite(beta).all() and np.isfinite(gamma).all()
        # charged bpp includes the side info: file size * 8 / (H*W)
        expected_bpp_floor = masters[0].stat().st_size * 8 / (192 * 192)
        assert res["bpp"] * 3 >= expected_bpp_floor  # avg over 3 images
