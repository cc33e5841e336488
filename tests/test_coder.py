"""Range coder + Huffman property tests (SURVEY §4 item 3: encode∘decode = id
on random sigma/mu/symbol streams)."""

import numpy as np
import pytest

from nvfpcc_tpu.coder import huffman
from nvfpcc_tpu.coder import range_coder as RC


class TestRangeCoder:
    @pytest.mark.parametrize("seed", range(4))
    def test_roundtrip_random_tables(self, seed):
        rng = np.random.default_rng(seed)
        ntab = int(rng.integers(1, 5))
        n = int(rng.integers(1, 5000))
        sigma = rng.uniform(0.01, 100.0, ntab).astype(np.float32)
        mu = rng.uniform(-100, 100, ntab).astype(np.float32)
        cum = RC.build_cum_tables(sigma, mu + RC.OFFSET)
        symbols = rng.integers(0, RC.N_SYM, n).astype(np.int32)
        table_ids = rng.integers(0, ntab, n).astype(np.int32)
        stream = RC.encode(symbols, table_ids, cum)
        out = RC.decode(stream, table_ids, cum)
        assert np.array_equal(out, symbols)

    @pytest.mark.parametrize("seed", range(3))
    def test_streaming_decoder_matches_oneshot(self, seed):
        """A stream decoded in arbitrary chunks through StreamingDecoder (with
        per-chunk table subsets) equals the one-shot decode."""
        rng = np.random.default_rng(seed + 100)
        ntab = int(rng.integers(2, 6))
        n = int(rng.integers(10, 3000))
        sigma = rng.uniform(0.01, 50.0, ntab).astype(np.float32)
        mu = rng.uniform(-50, 50, ntab).astype(np.float32)
        cum = RC.build_cum_tables(sigma, mu + RC.OFFSET)
        symbols = rng.integers(0, RC.N_SYM, n).astype(np.int32)
        table_ids = rng.integers(0, ntab, n).astype(np.int32)
        stream = RC.encode(symbols, table_ids, cum)

        out = np.empty(0, np.int32)
        with RC.StreamingDecoder(stream) as dec:
            off = 0
            while off < n:
                k = int(rng.integers(1, max(2, n // 4)))
                ids = table_ids[off : off + k]
                # per-call table subset with remapped ids (what ctx_coder does)
                uk, inv = np.unique(ids, return_inverse=True)
                chunk = dec.decode(inv.astype(np.int32), cum[uk])
                out = np.concatenate([out, chunk])
                off += k
        assert np.array_equal(out, symbols)

    def test_streaming_decoder_close_idempotent(self):
        cum = RC.build_cum_tables(
            np.float32([1.0]), np.float32([0.0]) + RC.OFFSET
        )
        ids = np.zeros(5, np.int32)
        stream = RC.encode(np.full(5, RC.OFFSET, np.int32), ids, cum)
        dec = RC.StreamingDecoder(stream)
        assert np.array_equal(dec.decode(ids, cum), np.full(5, RC.OFFSET))
        dec.close()
        dec.close()
        with pytest.raises(ValueError):
            dec.decode(ids, cum)

    def test_native_erf_matches_math_erf(self):
        """The batch erf the table builder uses must agree bit-exactly with
        math.erf (tables are a format contract; _select_erf_impl would fall
        back to the Python loop on mismatch, so this asserts we are NOT on
        the slow path on this platform)."""
        import math

        rng = np.random.default_rng(0)
        x = np.concatenate(
            [rng.uniform(-60, 60, 20000), rng.normal(0, 1e-6, 1000)]
        )
        got = RC._erf_batch(x)
        expect = np.asarray([math.erf(v) for v in x], np.float64)
        assert np.array_equal(got, expect)

    def test_rate_near_entropy(self):
        """Coded length within a few % of the model cross-entropy for
        model-matched data."""
        rng = np.random.default_rng(0)
        sigma, mu = np.float32([4.0]), np.float32([0.0])
        data = np.clip(np.rint(rng.normal(0, 4.0, 20000)), -500, 500).astype(np.int64)
        symbols = (data + RC.OFFSET).astype(np.int32)
        cum = RC.build_cum_tables(sigma, mu + RC.OFFSET)
        table_ids = np.zeros(len(symbols), np.int32)
        stream = RC.encode(symbols, table_ids, cum)
        bits = 8 * len(stream)
        # empirical entropy of N(0,4) integers ~ log2(sigma*sqrt(2*pi*e)) ~ 4.05
        assert bits / len(symbols) < 4.3

    def test_table_invariants(self):
        sigma = np.float32([0.001, 1.0, 50.0])
        mu = np.float32([-600.0, 0.0, 600.0])  # even far-out means stay codable
        cum = RC.build_cum_tables(sigma, mu + RC.OFFSET)
        assert cum.shape == (3, RC.N_SYM + 1)
        assert (cum[:, 0] == 0).all()
        assert (cum[:, -1] == RC.TOTAL).all()
        freqs = np.diff(cum.astype(np.int64), axis=1)
        assert freqs.min() >= 1  # every symbol decodable

    def test_latent_roundtrip(self):
        rng = np.random.default_rng(1)
        ch = 3
        sigma = rng.uniform(0.1, 8.0, ch).astype(np.float32)
        mu = rng.uniform(-2, 2, ch).astype(np.float32)
        lat = np.rint(rng.normal(0, 5, (917, 2, 2, 2, ch))).astype(np.float32)
        pack = RC.encode_latents(lat, sigma, mu)
        out = RC.decode_latents(pack)
        assert out.dtype == np.float32
        assert np.array_equal(out, lat)

    def test_out_of_range_rejected(self):
        lat = np.full((1, 2, 2, 2, 1), 1000.0, np.float32)
        with pytest.raises(ValueError):
            RC.encode_latents(lat, np.float32([1.0]), np.float32([0.0]))


class TestHuffman:
    @pytest.mark.parametrize("seed", range(3))
    def test_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        vals = np.rint(rng.normal(0, 3, 5000)).astype(np.int64)
        cb = huffman.build_codebook(vals)
        stream = huffman.encode(vals, cb)
        out = huffman.decode(stream, cb, len(vals))
        assert np.array_equal(out, vals)

    def test_native_matches_python_walk(self):
        """The native decoder and the pure-Python oracle agree bit-for-bit."""
        if huffman._load_lib() is None:
            pytest.skip("native huffman lib unavailable")
        rng = np.random.default_rng(7)
        # skewed distribution -> codes of many different lengths
        vals = np.rint(rng.standard_t(2, 8000) * 5).astype(np.int64)
        cb = huffman.build_codebook(vals)
        stream = huffman.encode(vals, cb)
        native = huffman.decode(stream, cb, len(vals))
        oracle = huffman._decode_py(stream, cb, len(vals))
        assert np.array_equal(native, oracle)
        assert np.array_equal(native, vals)

    def test_native_rejects_corrupt_stream(self):
        if huffman._load_lib() is None:
            pytest.skip("native huffman lib unavailable")
        vals = np.arange(64, dtype=np.int64) % 7
        cb = huffman.build_codebook(vals)
        stream = huffman.encode(vals, cb)
        with pytest.raises(ValueError):
            # ask for more symbols than the stream holds
            huffman.decode(stream, cb, len(vals) * 50)

    def test_single_symbol_codebook(self):
        vals = np.zeros(100, np.int64)
        cb = huffman.build_codebook(vals)
        stream = huffman.encode(vals, cb)
        assert np.array_equal(huffman.decode(stream, cb, 100), vals)
