"""Golden + property tests for SpookyHashV2 / MurmurHash3 x64-128.

Golden vectors are the reference's own
(``TestVarbinaryFunctions.java:310-311`` murmur, ``:343-348`` spooky).
The >=192-byte Spooky long path has no reference vector, so it gets
self-consistency properties (determinism, seed sensitivity, prefix
sensitivity, short/long boundary continuity of the API).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sensql_presto_spark.functions.spooky_murmur import (
    murmur3_x64_128,
    spooky_hash128,
    spooky_hash_v2_32,
    spooky_hash_v2_64,
)


def test_reference_golden_vectors():
    assert spooky_hash_v2_32(b"").hex().upper() == "6BF50919"
    assert spooky_hash_v2_32(b"hello").hex().upper() == "D382E6CA"
    assert spooky_hash_v2_64(b"").hex().upper() == "232706FC6BF50919"
    assert spooky_hash_v2_64(b"hello").hex().upper() == "3768826AD382E6CA"
    assert murmur3_x64_128(b"").hex().upper() == "00000000000000000000000000000000"
    assert (
        murmur3_x64_128(b"hashme").hex().upper()
        == "93192FE805BE23041C8318F67EC4F2BC"
    )


def test_spooky_32_is_low_word_of_64():
    """VarbinaryFunctions.java: hash32 is the low 32 bits of hash64."""
    for msg in (b"", b"hello", b"x" * 191, b"y" * 192, b"z" * 1000):
        h64 = spooky_hash_v2_64(msg)
        assert spooky_hash_v2_32(msg) == h64[4:]


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_spooky_deterministic_and_length_stable(msg):
    a = spooky_hash128(msg)
    assert a == spooky_hash128(msg)
    assert len(spooky_hash_v2_64(msg)) == 8
    assert len(spooky_hash_v2_32(msg)) == 4
    assert len(murmur3_x64_128(msg)) == 16


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=192, max_size=512), st.integers(0, 255))
def test_spooky_long_path_input_sensitive(msg, flip):
    """Flipping any byte changes the long-path hash (collision would be a
    2^-128 fluke — a deterministic failure means a broken mix)."""
    pos = flip % len(msg)
    mutated = msg[:pos] + bytes([msg[pos] ^ 0x01]) + msg[pos + 1 :]
    assert spooky_hash128(msg) != spooky_hash128(mutated)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_murmur_tail_block_agree_with_block_path(msg):
    """Inputs straddling the 16-byte block boundary hash consistently:
    padding to a full block must CHANGE the hash (length is folded in)."""
    padded = msg + b"\x00" * (16 - len(msg) % 16 if len(msg) % 16 else 16)
    assert murmur3_x64_128(msg) != murmur3_x64_128(padded)


def test_udf_registration(spark):
    from sensql_presto_spark.functions import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT hex(spooky_hash_v2_32(encode('hello', 'UTF-8'))) AS s32, "
        "hex(spooky_hash_v2_64(encode('hello', 'UTF-8'))) AS s64, "
        "hex(murmur3_x64_128(encode('hashme', 'UTF-8'))) AS m128"
    ).collect()[0]
    assert row.s32 == "D382E6CA"
    assert row.s64 == "3768826AD382E6CA"
    assert row.m128 == "93192FE805BE23041C8318F67EC4F2BC"
