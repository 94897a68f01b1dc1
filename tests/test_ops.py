"""Unit tests for the vectorized device ops against the native oracle.

This is the unit layer the reference lacks (SURVEY.md §4): each modeling
component is validated on small deterministic arrays and full Kodak frames.
"""

import numpy as np
import pytest

from nblic_tpu import runtime
from nblic_tpu.ops import context, histogram, predict, rans

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime unavailable"
)


def _stage1_np(img):
    import jax

    px0, err, qd, adr = jax.jit(predict.model_stage1)(img)
    return (np.asarray(px0), np.asarray(err), np.asarray(qd), np.asarray(adr))


class TestStage1:
    def test_matches_native_oracle_small(self, test_images):
        for img in test_images:
            px0, err, qd, adr = _stage1_np(img)
            ref_px0, ref_adr = runtime.q_stage1(img)
            np.testing.assert_array_equal(px0, ref_px0, err_msg=f"px0 {img.shape}")
            np.testing.assert_array_equal(adr, ref_adr, err_msg=f"adr {img.shape}")
            np.testing.assert_array_equal(err, img.astype(np.int32) - px0)
            np.testing.assert_array_equal(qd, adr >> 8)

    def test_matches_native_oracle_kodak(self, kodak01):
        px0, _, _, adr = _stage1_np(kodak01)
        ref_px0, ref_adr = runtime.q_stage1(kodak01)
        np.testing.assert_array_equal(px0, ref_px0)
        np.testing.assert_array_equal(adr, ref_adr)

    def test_batched_vmap(self, test_images):
        import jax

        img = test_images[3]  # (8, 8)
        batch = np.stack([img, img[::-1].copy()])
        px0_b, _, _, adr_b = jax.vmap(predict.model_stage1)(batch)
        for k in range(2):
            ref_px0, ref_adr = runtime.q_stage1(batch[k])
            np.testing.assert_array_equal(np.asarray(px0_b[k]), ref_px0)
            np.testing.assert_array_equal(np.asarray(adr_b[k]), ref_adr)


class TestResidualMap:
    @pytest.mark.parametrize("near", [0, 1, 3, 9])
    def test_fold_unfold_inverse(self, near):
        px, x = np.meshgrid(np.arange(256), np.arange(256))
        for sign in (0, 1):
            y = np.asarray(context.residual_fold(x, px, sign, near))
            rec = np.asarray(context.residual_unfold(y, px, sign, near))
            assert np.abs(rec - x).max() <= near
            if near == 0:
                np.testing.assert_array_equal(rec, x)

    def test_fold_range(self):
        px, x = np.meshgrid(np.arange(256), np.arange(256))
        y = np.asarray(context.residual_fold(x, px, 0, 0))
        assert y.min() == 0 and y.max() <= 255


class TestEwmaSteps:
    def test_q_ewma_matches_reference_constants(self):
        # spot-check the rounding constants: QNBLIC uses +63, NBLIC +64
        assert int(context.q_update_ctx(np.int32(0), np.int32(1))) == (2048 + 63) >> 7
        assert int(context.n_update_ctx(np.int32(0), np.int32(1))) == (256 + 64) >> 7
        # negative errors round toward -inf through the arithmetic shift
        assert int(context.q_update_ctx(np.int32(0), np.int32(-1))) == (-2048 + 63) >> 7


class TestHistogram:
    def test_normalize_sums(self, rng):
        for _ in range(20):
            h = rng.integers(0, 1000, size=256).astype(np.uint32)
            h[rng.integers(0, 256, size=rng.integers(0, 200))] = 0
            n = histogram.normalize(h)
            assert int(n.sum()) == histogram.NORM_SUM
        assert int(histogram.normalize(np.zeros(256, np.uint32)).sum()) == histogram.NORM_SUM
        one = np.zeros(256, np.uint32)
        one[255] = 17
        n = histogram.normalize(one)
        assert n[255] == histogram.NORM_SUM - 1 and n[0] == 1

    def test_serialize_roundtrip(self, rng):
        for _ in range(20):
            h = rng.integers(0, 500, size=256).astype(np.uint32)
            h[: rng.integers(0, 250)] = 0
            n = histogram.normalize(h)
            words = histogram.serialize(n)
            dec, pos = histogram.deserialize(words, 0)
            assert pos == len(words)
            np.testing.assert_array_equal(dec, n)

    def test_decode_lut(self):
        h = histogram.normalize(np.arange(256, dtype=np.uint32))
        acc = histogram.accumulate(h)
        lut = histogram.decode_lut(acc)
        for slot in [0, 1, 5000, 32767]:
            v = lut[slot]
            assert acc[v] <= slot
            assert slot < (acc[v + 1] if v < 255 else histogram.NORM_SUM)


class TestRans:
    def _ref_payload(self, img):
        """Extract the reference Q0.2 stream's rANS payload + its tables."""
        stream = runtime.q_encode(img, n_threads=1)
        words = np.frombuffer(stream, dtype=np.uint16)
        pos = 4  # Q0.2 header
        hists = []
        for _ in range(12):
            h, pos = histogram.deserialize(words, pos)
            hists.append(h)
        return words[pos:], np.stack(hists)

    def test_encode_scan_matches_reference_payload(self, test_images):
        for img in test_images[3:6]:
            payload, hists = self._ref_payload(img)
            qd, y, _ = runtime.q_model(img)
            accs = np.stack([histogram.accumulate(h) for h in hists])
            freq = hists[qd.ravel(), y.ravel()][None, :]
            acc = accs[qd.ravel(), y.ravel()][None, :]
            words, emits, state = rans.encode_scan(freq, acc)
            (mine,) = rans.finalize_streams(words, emits, state)
            np.testing.assert_array_equal(mine, payload)

    def test_dec_step_roundtrip(self, rng):
        import jax
        import jax.numpy as jnp

        # one synthetic stream: 500 symbols from a skewed distribution
        syms = rng.integers(0, 16, size=500) ** 2 % 256
        h = np.bincount(syms, minlength=256).astype(np.uint32)
        hn = histogram.normalize(h)
        acc = histogram.accumulate(hn)
        lut = histogram.decode_lut(acc)
        words, emits, state = rans.encode_scan(
            hn[syms][None, :], acc[syms][None, :]
        )
        (stream,) = rans.finalize_streams(words, emits, state)

        wj = jnp.asarray(stream.astype(np.int32))
        state0, ptr0 = rans.dec_start(wj)

        def step(carry, _):
            st, ptr = carry
            lb = st & rans.NORM_MASK
            sym = jnp.asarray(lut.astype(np.int32))[lb]
            st, ptr = rans.dec_step(
                st, ptr, wj, jnp.asarray(hn)[sym], jnp.asarray(acc)[sym], lb
            )
            return (st, ptr), sym

        (_, _), out = jax.lax.scan(step, (state0, ptr0), None, length=500)
        np.testing.assert_array_equal(np.asarray(out), syms)
