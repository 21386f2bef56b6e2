"""Embeddable in-memory API (alignPairR/alignSingleR analog,
soap3-dp-module.h:57-73)."""

import numpy as np

from soap3dp_tpu import api
from soap3dp_tpu.utils import dna


def _loaded(small_index, small_device_index):
    return api.LoadedIndex(index=small_index, didx=small_device_index)


def test_align_single_r(small_index, small_device_index, small_genome):
    codes = small_genome.codes
    p = 1234
    seq = dna.decode(codes[p:p + 60]).decode()
    res = api.align_single_r(_loaded(small_index, small_device_index),
                             [seq, "A" * 40])
    r0 = [a for a in res if a.read_id == 0]
    assert r0 and r0[0].mapped
    assert r0[0].pos == p and r0[0].chrom == small_index.names[0]
    assert r0[0].cigar == "60M"


def test_align_pair_r(small_index, small_device_index, small_genome):
    codes = small_genome.codes
    p, ins, L = 4000, 200, 50
    s1 = dna.decode(codes[p:p + L]).decode()
    s2 = dna.decode(dna.revcomp_codes(codes[p + ins - L:p + ins])).decode()
    res = api.align_pair_r(_loaded(small_index, small_device_index),
                           [s1], [s2], min_insert=100, max_insert=300)
    assert len(res) == 2
    first = next(a for a in res if a.flag & 0x40)
    second = next(a for a in res if a.flag & 0x80)
    assert first.mapped and second.mapped
    assert first.pos == p
    assert second.pos == p + ins - L
    assert first.tlen == ins and second.tlen == -ins
