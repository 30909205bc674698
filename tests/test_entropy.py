import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from rgbdc_tpu.entropy import (
    EntropyBottleneck,
    build_bottleneck_tables,
    build_gaussian_tables,
    build_indexes,
    gaussian_likelihood,
    get_scale_table,
    pmf_to_quantized_cdf_py,
)


class TestGaussianLikelihood:
    def test_matches_closed_form(self, rng):
        y = jnp.asarray(rng.normal(size=(2, 4, 4, 3)) * 3, dtype=jnp.float32)
        scales = jnp.asarray(rng.uniform(0.2, 5.0, size=y.shape), dtype=jnp.float32)
        means = jnp.asarray(rng.normal(size=y.shape), dtype=jnp.float32)
        lik = np.asarray(gaussian_likelihood(y, scales, means))
        v = np.abs(np.asarray(y) - np.asarray(means))
        s = np.asarray(scales)
        expected = norm.cdf((0.5 - v) / s) - norm.cdf((-0.5 - v) / s)
        np.testing.assert_allclose(lik, expected, rtol=1e-4, atol=1e-7)

    def test_scale_bound_applied(self):
        lik_small = gaussian_likelihood(jnp.zeros((1,)), jnp.full((1,), 1e-6))
        lik_bound = gaussian_likelihood(jnp.zeros((1,)), jnp.full((1,), 0.11))
        np.testing.assert_allclose(lik_small, lik_bound)

    def test_likelihood_floor(self):
        lik = gaussian_likelihood(jnp.full((1,), 1000.0), jnp.full((1,), 0.2))
        assert float(lik[0]) >= 9e-10  # f32(1e-9)


class TestBuildIndexes:
    def test_matches_reference_semantics(self, rng):
        table = get_scale_table()
        scales = rng.uniform(0.05, 300.0, size=(1000,)).astype(np.float32)
        idx = np.asarray(build_indexes(jnp.asarray(scales), table))
        # reference loop (entropy_models.py:561-568)
        clamped = np.maximum(scales, 0.11)
        expected = np.full(scales.shape, len(table) - 1, dtype=np.int32)
        for s in table[:-1]:
            expected -= (clamped <= s).astype(np.int32)
        np.testing.assert_array_equal(idx, expected)


class TestPmfToCdf:
    def test_valid_cdf(self, rng):
        pmf = rng.uniform(0, 1, size=17).astype(np.float32)
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf_py(pmf)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) > 0)

    def test_zero_prob_symbols_fixed(self):
        pmf = np.array([0.5, 0.0, 0.5, 1e-12], dtype=np.float32)
        cdf = pmf_to_quantized_cdf_py(pmf)
        assert np.all(np.diff(cdf) > 0)

    def test_matches_c_implementation(self, rng):
        from rgbdc_tpu.coder import pmf_to_quantized_cdf

        for _ in range(20):
            n = int(rng.integers(2, 200))
            pmf = rng.uniform(0, 1, size=n).astype(np.float32)
            pmf /= pmf.sum() * rng.uniform(1.0, 1.5)  # not exactly normalized
            np.testing.assert_array_equal(
                pmf_to_quantized_cdf_py(pmf), pmf_to_quantized_cdf(pmf)
            )


class TestGaussianTables:
    def test_table_shapes(self):
        t = build_gaussian_tables(get_scale_table())
        assert t.cdf.shape[0] == 64
        assert t.cdf_length.shape == (64,)
        assert np.all(t.cdf_length >= 3)
        # per-row validity
        for i in range(64):
            row = t.cdf[i, : t.cdf_length[i]]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) > 0)

    def test_offset_symmetric(self):
        t = build_gaussian_tables(get_scale_table())
        np.testing.assert_array_equal(-2 * t.offset + 1, t.cdf_length - 2)


class TestEntropyBottleneck:
    def _init(self, c=8):
        eb = EntropyBottleneck(channels=c)
        x = jnp.zeros((1, 4, 4, c))
        variables = eb.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x,
            training=True,
        )
        return eb, variables, x

    def test_eval_forward_rounds_around_median(self, rng):
        eb, variables, _ = self._init()
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)) * 5, dtype=jnp.float32)
        x_hat, lik = eb.apply(variables, x, training=False)
        medians = np.asarray(
            eb.apply(variables, method=EntropyBottleneck.medians)
        ).reshape(1, 1, 1, -1)
        expected = np.round(np.asarray(x) - medians) + medians
        np.testing.assert_allclose(np.asarray(x_hat), expected, atol=1e-5)
        assert np.all(np.asarray(lik) > 0) and np.all(np.asarray(lik) <= 1.0)

    def test_train_forward_adds_bounded_noise(self, rng):
        eb, variables, _ = self._init()
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), dtype=jnp.float32)
        x_hat, _ = eb.apply(
            variables, x, training=True, rngs={"noise": jax.random.PRNGKey(7)}
        )
        assert np.max(np.abs(np.asarray(x_hat) - np.asarray(x))) <= 0.5

    def test_aux_loss_grads_only_quantiles(self):
        eb, variables, _ = self._init()

        def loss_fn(params):
            return eb.apply({"params": params}, method=EntropyBottleneck.aux_loss)

        g = jax.grad(loss_fn)(variables["params"])
        assert float(jnp.sum(jnp.abs(g["quantiles"]))) > 0
        for k, v in g.items():
            if k != "quantiles":
                assert float(jnp.sum(jnp.abs(v))) == 0.0, k

    def test_likelihood_sums_near_one(self):
        # pmf over a wide integer support should nearly sum to 1 per channel
        eb, variables, _ = self._init(c=4)
        # at init the factorized prior is wide (init_scale=10 with heavy
        # tails) — integrate out to +-300
        offsets = jnp.arange(-300, 301, dtype=jnp.float32)
        x = jnp.tile(offsets.reshape(1, -1, 1, 1), (1, 1, 1, 4))
        _, lik = eb.apply(variables, x, training=False)
        sums = np.asarray(lik).sum(axis=1).reshape(-1)
        assert np.all(sums > 0.999) and np.all(sums <= 1.0 + 1e-5)

    def test_tables_match_likelihoods(self):
        # quantized CDF widths should approximate the analytic pmf
        eb, variables, _ = self._init(c=4)
        table, medians = build_bottleneck_tables(variables["params"])
        assert table.cdf.shape[0] == 4
        for i in range(4):
            row = table.cdf[i, : table.cdf_length[i]]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) > 0)


class TestScaleBoundKnob:
    def test_env_floor_overrides_default(self, monkeypatch):
        """RGBDC_SCALE_BOUND raises the minimum sigma used for CDF-row
        selection (serving-side rate/speed knob, docs/PERF.md)."""
        import numpy as np

        from rgbdc_tpu.entropy import get_scale_table
        from rgbdc_tpu.entropy.gaussian import build_indexes

        st = get_scale_table()
        scales = jnp.asarray([0.05, 0.2, 8.0, 300.0])
        base = np.asarray(build_indexes(scales, st))
        monkeypatch.setenv("RGBDC_SCALE_BOUND", "16")
        floored = np.asarray(build_indexes(scales, st))
        floor_idx = int(np.searchsorted(st[:-1], 16.0, side="left"))
        assert (floored >= floor_idx).all()
        # entries already above the floor are untouched
        assert floored[3] == base[3]
        # explicit argument wins over the env
        explicit = np.asarray(build_indexes(scales, st, scale_bound=0.11))
        assert np.array_equal(explicit, base)


class TestBuildIndexesEquivalence:
    def test_matches_searchsorted_semantics(self):
        """The unrolled compare-sum must be bit-identical to
        jnp.searchsorted(side='left') incl. exact-tie entries."""
        import numpy as np

        from rgbdc_tpu.entropy import get_scale_table
        from rgbdc_tpu.entropy.gaussian import SCALE_BOUND, build_indexes

        st = get_scale_table()
        rng = np.random.default_rng(0)
        scales = np.concatenate([
            rng.uniform(0.0, 300.0, 5000).astype(np.float32),
            st[:-1].astype(np.float32),          # exact table entries (ties)
            np.asarray([0.0, SCALE_BOUND, 1e9], np.float32),
        ])
        got = np.asarray(build_indexes(jnp.asarray(scales), st))
        clamped = np.maximum(scales, SCALE_BOUND)
        want = np.searchsorted(st[:-1].astype(np.float32), clamped, side="left")
        np.testing.assert_array_equal(got, want.astype(np.uint8))


class TestEBSupportMargin:
    """RGBDC_EB_MARGIN (entropy/tables.py build_bottleneck_tables): the pmf
    support extends ``margin`` integer symbols past the learned tail_mass
    quantiles, priced at the model's own density (freq floor 1), so
    near-tail latents of under-fit factorized priors code in-range
    (~16 bits) instead of through the ~36-bit escape sideband (428
    escapes/batch at q6 before the margin — VERDICT r4 task 3)."""

    def _params(self, c=4):
        eb = EntropyBottleneck(channels=c)
        variables = eb.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 4, 4, c)),
            training=True,
        )
        return variables["params"]

    def test_margin_widens_support_symmetrically(self):
        params = self._params()
        t0, med0 = build_bottleneck_tables(params, margin=0)
        t2, med2 = build_bottleneck_tables(params, margin=2)
        np.testing.assert_array_equal(med0, med2)
        # 2 extra symbols per side -> +4 pmf slots, offset shifted left by 2
        np.testing.assert_array_equal(t2.cdf_length, t0.cdf_length + 4)
        np.testing.assert_array_equal(t2.offset, t0.offset - 2)
        # every widened row is still a valid strictly-increasing CDF over
        # the full 2^16 range (the sub-floor tail rows get freq >= 1)
        for i in range(t2.cdf.shape[0]):
            row = t2.cdf[i, : t2.cdf_length[i]]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) > 0)

    def test_near_tail_symbol_escapes_only_without_margin(self):
        from rgbdc_tpu.coder import rans_tpu as rt

        params = self._params()
        t0, _ = build_bottleneck_tables(params, margin=0)
        t2, _ = build_bottleneck_tables(params, margin=2)
        # one symbol past the margin-0 support's upper edge, per channel
        c = t0.cdf.shape[0]
        idx = np.arange(c, dtype=np.int64)
        sym = (t0.offset + (t0.cdf_length - 2)).astype(np.int64)
        esc0 = rt.escape_chunks(sym, idx, t0)
        esc2 = rt.escape_chunks(sym, idx, t2)
        assert len(esc0) == c  # every channel escapes on the tight table
        assert esc2 == []     # ...and codes in-range under margin 2
