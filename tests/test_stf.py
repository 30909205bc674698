import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import ChannelARCodec, SymmetricalTransFormer

TINY = dict(embed_dim=8, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
            num_slices=4, in_ch=3)


@pytest.fixture(scope="module")
def stf_setup():
    model = SymmetricalTransFormer(**TINY)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x,
        training=True,
    )
    return model, v


class TestSwinPrimitives:
    def test_window_partition_reverse(self, rng):
        from rgbdc_tpu.nn.swin import window_partition, window_reverse

        x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), dtype=jnp.float32)
        w = window_partition(x, 4)
        assert w.shape == (2 * 2 * 3, 16, 5)
        np.testing.assert_allclose(window_reverse(w, 4, 8, 12), x)

    def test_patch_merge_split_shapes(self, rng):
        from rgbdc_tpu.nn.swin import PatchMerging, PatchSplit

        x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), dtype=jnp.float32)
        pm = PatchMerging(16)
        v = pm.init(jax.random.PRNGKey(0), x)
        y = pm.apply(v, x)
        assert y.shape == (1, 4, 4, 32)
        ps = PatchSplit(32)
        v2 = ps.init(jax.random.PRNGKey(0), y)
        z = ps.apply(v2, y)
        assert z.shape == (1, 8, 8, 16)

    def test_window_attention_matches_feature_minor_reference(self, rng):
        """The spatial-minor WindowAttention layout (round 5 — the MLIC
        LocalContext lesson applied to the swin stack) must be numerically
        equivalent to the original feature-minor einsum formulation, with
        and without the shift mask."""
        from rgbdc_tpu.nn.swin import (
            WindowAttention,
            _relative_position_index,
            _shift_attn_mask,
        )

        heads, w, c = 2, 4, 16
        n = w * w
        x = jnp.asarray(rng.normal(size=(6, n, c)), dtype=jnp.float32)
        wa = WindowAttention(c, num_heads=heads, window=w)
        v = wa.init(jax.random.PRNGKey(0), x)
        mask = _shift_attn_mask(8, 12, w, 2)  # nW = 6

        for m in (None, mask):
            got = np.asarray(wa.apply(v, x, m))
            p = v["params"]
            qkv = x @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]
            qkv = qkv.reshape(6, n, 3, heads, c // heads).transpose(2, 0, 3, 1, 4)
            q, k, vv = qkv[0] * (c // heads) ** -0.5, qkv[1], qkv[2]
            attn = jnp.einsum("bhid,bhjd->bhij", q, k,
                              preferred_element_type=jnp.float32)
            idx = jnp.asarray(_relative_position_index(w).reshape(-1))
            bias = p["relative_position_table"][idx].reshape(n, n, heads)
            attn = attn + bias.transpose(2, 0, 1)[None]
            if m is not None:
                attn = attn.reshape(1, 6, heads, n, n) + jnp.asarray(m)[None, :, None]
                attn = attn.reshape(6, heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn, vv,
                             preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(6, n, c)
            want = np.asarray(out @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"])
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_shifted_block_runs(self, rng):
        from rgbdc_tpu.nn.swin import SwinBlock

        x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), dtype=jnp.float32)
        blk = SwinBlock(16, num_heads=2, window=4, shift=2)
        v = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(v, x)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


class TestSTF:
    def test_forward_shapes(self, stf_setup, rng):
        model, v = stf_setup
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        out = model.apply(v, x, training=False)
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (1, 4, 4, model.M)
        assert out["likelihoods"]["z"].shape == (1, 1, 1, model.N)

    def test_roundtrip_matches_forward(self, stf_setup, rng):
        model, v = stf_setup
        codec = ChannelARCodec(model, v)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        out = codec.compress(x)
        dec = codec.decompress(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )

    def test_channel_ar_support_limit(self, stf_setup):
        # support is capped at num_slices // 2
        model, _ = stf_setup
        assert model.max_support_slices == 2
