"""Parity of the vectorized many-block decoder vs per-block decode.

The serving tier loads a shard by decoding EVERY posting block at
once (codec.decode_blocks_concat); this pins it byte-for-byte to the
per-block ``decode_block`` reference path on randomized blocks.
"""

import numpy as np
import pytest

from rusticsearch_spark.index.codec import (decode_block,
                                            decode_blocks_concat,
                                            encode_block,
                                            varbyte_decode,
                                            varbyte_decode_concat,
                                            varbyte_encode)


def _concat(bufs):
    buf = b"".join(bufs)
    off = np.zeros(len(bufs) + 1, np.int64)
    np.cumsum([len(b) for b in bufs], out=off[1:])
    return np.frombuffer(buf, np.uint8), off


def test_varbyte_decode_concat_matches_per_stream():
    rng = np.random.default_rng(3)
    streams = [rng.integers(0, 1 << int(b), size=int(n)).astype(np.uint64)
               for b, n in zip(rng.integers(1, 50, size=60),
                               rng.integers(0, 30, size=60))]
    bufs = [varbyte_encode(s) for s in streams]
    buf, off = _concat(bufs)
    vals, counts = varbyte_decode_concat(buf, off)
    st = 0
    for s, b, c in zip(streams, bufs, counts):
        assert c == s.size
        assert np.array_equal(vals[st:st + c], varbyte_decode(b))
        assert np.array_equal(vals[st:st + c], s)
        st += c
    assert st == vals.size


def test_varbyte_decode_concat_empty():
    vals, counts = varbyte_decode_concat(np.zeros(0, np.uint8),
                                         np.zeros(5, np.int64))
    assert vals.size == 0
    assert np.array_equal(counts, np.zeros(4, np.int64))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_decode_blocks_concat_matches_decode_block(seed):
    rng = np.random.default_rng(seed)
    blocks = []
    for _ in range(150):
        seg = int(rng.integers(0, 6))
        n = int(rng.integers(1, 50))
        ids = (np.sort(rng.choice(65536, size=n, replace=False))
               + (seg << 16))
        tfs = rng.integers(1, 500, size=n)
        lens = rng.integers(0, 256, size=n)
        blocks.append((seg, *encode_block(ids, tfs, lens)))
    segs = np.array([b[0] for b in blocks])
    dbuf, doff = _concat([b[1] for b in blocks])
    tbuf, toff = _concat([b[2] for b in blocks])
    lbuf, _loff = _concat([b[3] for b in blocks])
    ids, tfs, lens, counts = decode_blocks_concat(
        segs, dbuf, doff, tbuf, toff, lbuf, _loff)
    st = 0
    for (seg, db, tb, lb), c in zip(blocks, counts):
        gid, gtf, gln = decode_block(seg, db, tb, lb)
        assert c == gid.size
        assert np.array_equal(ids[st:st + c], gid)
        assert np.array_equal(tfs[st:st + c], gtf)
        assert np.array_equal(lens[st:st + c], gln)
        st += c
    assert st == ids.size


def test_in_sorted_matches_isin():
    from hypothesis import given, settings, strategies as st

    from rusticsearch_spark.query.local import _in_sorted

    @given(st.lists(st.integers(0, 100), max_size=40),
           st.lists(st.integers(0, 100), max_size=40))
    @settings(max_examples=200, deadline=None)
    def check(vals, members):
        values = np.array(vals, dtype=np.int64)
        sorted_arr = np.unique(np.array(members, dtype=np.int64))
        got = _in_sorted(values, sorted_arr)
        want = np.isin(values, sorted_arr)
        assert np.array_equal(got, want)

    check()


def test_in_sorted_edges():
    from rusticsearch_spark.query.local import _in_sorted
    e = np.empty(0, dtype=np.int64)
    assert _in_sorted(e, np.array([1, 2])).size == 0
    assert not _in_sorted(np.array([1, 2]), e).any()
    # values beyond both ends of the sorted array
    got = _in_sorted(np.array([-5, 1, 99], dtype=np.int64),
                     np.array([0, 1, 2], dtype=np.int64))
    assert got.tolist() == [False, True, False]
