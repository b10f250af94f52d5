"""Decoder totality: arbitrary bytes fed to the legacy page decompressors
must either decode or raise a clean ``ValueError`` — never an unnamed
exception type and never a hang.

This is the contract the readers rely on (``rayenc/parquet_read_enc.py``
surfaces decode failures per-page with file/column context, and
``decode_dataset``'s ``bad_block_threshold`` counts them); a raw
``IndexError``/``struct.error`` escaping a codec would bypass both.  The
reference decodes these formats through aircompressor / Hadoop native
codecs which enforce the same fail-closed behavior
(parquet-hadoop/.../codec/NonBlockedDecompressorStream.java).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from rayenc.codecs.lz4hadoop import Lz4HadoopCodec, _lz4_block_decompress
from rayenc.codecs.lzo import LzoHadoopCodec, lzo1x_decompress

_garbage = st.binary(min_size=0, max_size=512)
_sizes = st.integers(min_value=0, max_value=1 << 20)


@settings(max_examples=300, deadline=1000)
@given(_garbage)
def test_lzo1x_decompress_total(data):
    try:
        out = lzo1x_decompress(data)
    except ValueError:
        return
    assert isinstance(out, bytes)


@settings(max_examples=300, deadline=1000)
@given(_garbage, _sizes)
def test_lzo_hadoop_page_total(data, size):
    try:
        out = LzoHadoopCodec().decompress(data, size)
    except ValueError:
        return
    assert isinstance(out, bytes) and len(out) == size


@settings(max_examples=300, deadline=1000)
@given(_garbage, _sizes)
def test_lz4_hadoop_page_total(data, size):
    try:
        out = Lz4HadoopCodec().decompress(data, size)
    except ValueError:
        return
    # either dialect may accept; the Hadoop walk enforces the exact size,
    # the raw fallback trusts Arrow's stated size
    assert isinstance(out, bytes)


@settings(max_examples=300, deadline=1000)
@given(_garbage)
def test_lz4_pure_block_total(data):
    try:
        out = _lz4_block_decompress(data)
    except (ValueError, IndexError):
        # IndexError is this internal helper's documented truncation signal;
        # both are caught at its only call site (lz4hadoop.py _try_hadoop)
        return
    assert isinstance(out, bytes)
