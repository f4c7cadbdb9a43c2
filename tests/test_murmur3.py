"""Murmur3-seed-0 parity vectors (reference routing, DeltaReader.java:60-63)."""

from pulsar_io_delta_spark.functions.murmur3 import murmur3_32, partition_id_for

# Standard murmurhash3_x86_32 seed-0 vectors (public test vectors).
KNOWN = {
    b"": 0,
    b"hello": 0x248BFA47,
    b"abc": 0xB3DD93FA,
    b"Hello, world!": 0xC0363E43,
    b"The quick brown fox jumps over the lazy dog": 0x2E4FF723,
}


def test_known_vectors():
    for data, expect in KNOWN.items():
        assert murmur3_32(data) == expect, data


def test_partition_id_range_and_determinism():
    values = [f"event_type={t}" for t in ("click", "purchase", "signup", "error")]
    for v in values:
        pid = partition_id_for(v, 8)
        assert 0 <= pid < 8
        assert pid == partition_id_for(v, 8)


def test_tail_lengths():
    # exercise 1/2/3-byte tails of the algorithm
    for s in (b"a", b"ab", b"abc", b"abcd", b"abcde"):
        h = murmur3_32(s)
        assert 0 <= h <= 0xFFFFFFFF
