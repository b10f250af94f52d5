"""ALP codec (rayenc/codecs/alp.py) — bit-exact float compression via
decimal-to-int transform + exception patches (public ALP paper scheme)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rayenc.codecs import alp


def _exact(v, got):
    u = np.uint32 if v.dtype == np.float32 else np.uint64
    return got.dtype == v.dtype and got.view(u).tobytes() == v.view(u).tobytes()


class TestRoundtrip:
    def test_decimal_doubles(self):
        rng = np.random.default_rng(1)
        v = np.round(rng.uniform(1, 1e5, 20000), 2)
        buf = alp.encode(v)
        assert _exact(v, alp.decode(buf, len(v)))
        assert len(buf) < v.nbytes * 0.7  # the point of the codec

    def test_integral_doubles(self):
        v = np.arange(10000, dtype=np.float64)
        buf = alp.encode(v)
        assert _exact(v, alp.decode(buf, len(v)))
        assert len(buf) < v.nbytes * 0.1

    def test_random_doubles_all_patched(self):
        rng = np.random.default_rng(2)
        v = rng.standard_normal(5000)
        got = alp.decode(alp.encode(v), len(v))
        assert _exact(v, got)

    def test_specials(self):
        v = np.array(
            [np.nan, np.inf, -np.inf, -0.0, 0.0, 1e300, -1e-300, 5e-324, 123.456]
        )
        assert _exact(v, alp.decode(alp.encode(v), len(v)))

    def test_negative_zero_is_exception(self):
        v = np.array([-0.0, 0.0, 1.5])
        p = alp.Plan(v)
        assert 0 in p.exc_pos  # int 0 decodes to +0.0, not -0.0

    def test_float32(self):
        rng = np.random.default_rng(3)
        v = np.round(rng.uniform(0, 1000, 20000), 2).astype(np.float32)
        buf = alp.encode(v)
        got = alp.decode(buf, len(v), np.float32)
        assert _exact(v, got)
        assert len(buf) < v.nbytes  # scaled ints beat 4-byte floats

    def test_float32_random(self):
        rng = np.random.default_rng(4)
        v = rng.standard_normal(3000).astype(np.float32)
        assert _exact(v, alp.decode(alp.encode(v), len(v), np.float32))

    def test_empty(self):
        v = np.empty(0, np.float64)
        assert len(alp.decode(alp.encode(v), 0)) == 0

    def test_beyond_2_53_patched(self):
        v = np.array([2.0**60, 1.5, 2.0**53])
        assert _exact(v, alp.decode(alp.encode(v), len(v)))

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.floats(allow_nan=False, width=64),
                st.decimals(
                    min_value=-10**9, max_value=10**9, places=3
                ).map(float),
            ),
            max_size=300,
        )
    )
    def test_property_any_doubles(self, xs):
        v = np.asarray(xs, np.float64)
        got = alp.decode(alp.encode(v), len(v))
        assert _exact(v, got)

    def test_inner_for_picked_for_bounded_ints(self):
        rng = np.random.default_rng(9)
        v = np.round(rng.uniform(0, 100, 20000), 2)  # ints fit 14 bits
        p = alp.Plan(v)
        assert p.inner_for  # FoR beats delta on unsorted bounded streams
        assert _exact(v, alp.decode(p.emit(), len(v)))

    def test_inner_delta_for_wide_range(self):
        v = np.cumsum(np.ones(10000)) * 1e10  # sorted, range needs >32 bits
        p = alp.Plan(v)
        assert not p.inner_for
        assert _exact(v, alp.decode(p.emit(), len(v)))

    def test_nan_payloads_preserved(self):
        # distinct NaN bit patterns survive the raw-value patch path
        v = np.array([np.uint64(0x7FF8000000000001), np.uint64(0x7FF0000000000042)]).view(
            np.float64
        )
        got = alp.decode(alp.encode(v), len(v))
        assert got.view(np.uint64).tolist() == v.view(np.uint64).tolist()


class TestSelectorIntegration:
    def test_selector_picks_alp_for_prices(self, tmp_path):
        import pyarrow as pa

        from rayenc import blocks
        from rayenc.selector import EncodeConfig

        rng = np.random.default_rng(5)
        t = pa.table({"price": np.round(rng.uniform(1, 1e5, 30000), 2)})
        blob, manifest = blocks.encode_block(t, EncodeConfig())
        enc = {c["name"]: c["encoding"] for c in manifest["chunks"]}
        assert enc["price"] == "ALP"
        got = blocks.decode_block(blob, manifest)
        assert got.equals(t)

    def test_selector_rejects_alp_for_random(self):
        import pyarrow as pa

        from rayenc import blocks
        from rayenc.selector import EncodeConfig

        rng = np.random.default_rng(6)
        t = pa.table({"x": rng.standard_normal(30000)})
        blob, manifest = blocks.encode_block(t, EncodeConfig())
        enc = {c["name"]: c["encoding"] for c in manifest["chunks"]}
        assert enc["x"] != "ALP"  # exception-dominated: not applicable
        assert blocks.decode_block(blob, manifest).equals(t)

    def test_forced_alp_roundtrip_with_nulls(self):
        import pyarrow as pa

        from rayenc import blocks
        from rayenc.selector import EncodeConfig

        rng = np.random.default_rng(7)
        vals = np.round(rng.uniform(0, 100, 5000), 2)
        arr = pa.array(vals)
        arr = arr.take(
            pa.array(
                [i if i % 7 else None for i in range(len(vals))], pa.int64()
            )
        )
        t = pa.table({"v": arr})
        cfg = EncodeConfig(column_encodings={"v": "ALP"})
        blob, manifest = blocks.encode_block(t, cfg)
        enc = {c["name"]: c["encoding"] for c in manifest["chunks"]}
        assert enc["v"] == "ALP"
        assert blocks.decode_block(blob, manifest).equals(t)

    def test_alp_not_parquet_legal(self):
        from rayenc.parquet_write import PARQUET_LEGAL

        assert "ALP" not in PARQUET_LEGAL
