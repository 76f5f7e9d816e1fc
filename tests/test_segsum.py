"""Blocked Pallas segment-sum kernel (ops/segsum_pallas.py) and the XLA
fallback's precision envelope at realistic scale (ADVICE r2: the cumsum-diff
formulation loses precision as ~sqrt(M); the unit tests previously only
exercised M=5000)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _ref(ids, vals, S):
    out = np.zeros((S, vals.shape[1]), np.float64)
    keep = ids < S
    np.add.at(out, ids[keep], vals[keep].astype(np.float64))
    return out.astype(np.float32)


class TestBlockedKernelInterpret:
    @pytest.mark.slow
    def test_matches_reference_small(self):
        # interpret-mode compile is slow; keep the shape tiny. Covers:
        # multiple chunks, dropped ids >= S, empty segments, C padding.
        from gsavatar.ops.segsum_pallas import segment_sum_sorted_blocked
        rng = np.random.default_rng(0)
        M, C, S = 1536, 3, 300
        ids = np.sort(rng.integers(0, S + 5, size=M)).astype(np.int32)
        vals = rng.standard_normal((M, C)).astype(np.float32)
        got = np.asarray(segment_sum_sorted_blocked(
            jnp.asarray(vals), jnp.asarray(ids), S, interpret=True))
        # tolerance: the kernel's hi/lo bf16 split carries ~2^-18 relative
        # error per element (segsum_pallas.py) — far below gradient noise
        np.testing.assert_allclose(got, _ref(ids, vals, S),
                                   rtol=1e-4, atol=1e-4)


class TestXlaFallbackScale:
    def test_precision_at_realistic_scale(self):
        # the hash-grid backward reduces ~7.3M elements; the fallback's
        # error per segment grows like ulp(running sum) ~ sqrt(M). Document
        # the envelope at 2M elements: p99 relative error must stay below
        # 1% (gradient-noise scale). The TPU path (blocked kernel) sums
        # each 512-row block exactly and is tested above / on-device.
        from gsavatar.ops import segsum
        rng = np.random.default_rng(1)
        M, C, S = 2_000_000, 1, 100_000
        ids = np.sort(rng.integers(0, S, size=M)).astype(np.int32)
        vals = rng.standard_normal((M, C)).astype(np.float32)
        got = np.asarray(segsum.segment_sum_sorted(
            jnp.asarray(vals), jnp.asarray(ids), S))
        ref = _ref(ids, vals, S)
        denom = np.maximum(np.abs(ref), 1e-3)
        rel = np.abs(got - ref) / denom
        assert np.percentile(rel, 99) < 1e-2, np.percentile(rel, 99)


class TestUnsortedSegmentSum:
    def test_values_ride_sort(self):
        from gsavatar.ops import segsum
        rng = np.random.default_rng(2)
        M, C, S = 20_000, 12, 1024
        ids = rng.integers(0, S + 10, size=M).astype(np.int32)  # some OOB
        vals = rng.standard_normal((M, C)).astype(np.float32)
        got = np.asarray(segsum.segment_sum(
            jnp.asarray(vals), jnp.asarray(ids), S))
        np.testing.assert_allclose(got, _ref(ids, vals, S),
                                   rtol=1e-4, atol=1e-4)


class TestLeveledPackedTPUPath:
    def test_packed_bf16_path_matches_oracle(self, monkeypatch):
        """The TPU fast path of segment_sum_leveled (u16 ids + one packed
        bf16-pair u32 riding the sort — 6 B/elem of sort traffic) must sum
        the bf16-rounded cotangents EXACTLY (f32 MXU accumulation in the
        blocked kernel), and stay within bf16 rounding of the f64 oracle.
        tinycudann runs the whole hash encoding incl. gradient accumulation
        in fp16, so half-precision cotangents are parity-faithful."""
        monkeypatch.setenv("GSAVATAR_SEGSUM", "pallas_interpret")
        import numpy as np
        import jax.numpy as jnp
        from gsavatar.ops.segsum import segment_sum_leveled

        rng = np.random.default_rng(0)
        L, Mp, T = 4, 2048, 512
        vals = jnp.asarray(rng.standard_normal((L, Mp, 2)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, T, (L, Mp)), jnp.int32)
        out = np.asarray(segment_sum_leveled(vals, ids, T))
        v16 = np.asarray(vals.astype(jnp.bfloat16).astype(jnp.float32),
                         np.float64)
        ref = np.zeros((L * T, 2), np.float64)
        ii = np.asarray(ids)
        for l in range(L):
            np.add.at(ref, l * T + ii[l], v16[l])
        np.testing.assert_allclose(out, ref, atol=1e-5)
