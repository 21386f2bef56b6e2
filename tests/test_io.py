"""IO layer tests: FASTQ/FASTA readers, succinct format, BAM container, ini."""

import gzip
import struct

import numpy as np
import pytest

from soap3dp_tpu.io import fastq
from soap3dp_tpu.io.sam import SamRecord
from soap3dp_tpu.io.succinct import BamWriter, SuccinctWriter, read_succinct
from soap3dp_tpu.utils import dna


def test_fastq_reader(tmp_path):
    p = tmp_path / "r.fq"
    p.write_text("@a x\nACGT\n+\nIIII\n@b\nGGTTAA\n+\nABCDEF\n")
    batches = list(fastq.read_single(p, batch_size=10, max_len=8))
    assert len(batches) == 1
    b = batches[0]
    assert list(b.names) == [b"a", b"b"]
    assert list(b.lens) == [4, 6]
    assert dna.decode(b.codes[0, :4]) == b"ACGT"
    assert b.quals[1, :6].tobytes() == b"ABCDEF"


def test_fasta_reader_multiline_gz(tmp_path):
    p = tmp_path / "r.fa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">x\nACGT\nACGT\n>y desc\nTTTT\n")
    b = next(fastq.read_single(p, max_len=16))
    assert list(b.names) == [b"x", b"y"]
    assert dna.decode(b.codes[0, :8]) == b"ACGTACGT"
    assert b.quals is None


def test_paired_reader_lockstep_and_interleaved(tmp_path):
    p1 = tmp_path / "1.fq"
    p2 = tmp_path / "2.fq"
    p1.write_text("@a/1\nAAAA\n+\nIIII\n")
    p2.write_text("@a/2\nCCCC\n+\nIIII\n")
    (b1, b2), = list(fastq.read_pairs(p1, p2, max_len=8))
    assert dna.decode(b1.codes[0, :4]) == b"AAAA"
    assert dna.decode(b2.codes[0, :4]) == b"CCCC"
    pi = tmp_path / "i.fq"
    pi.write_text("@a/1\nAAAA\n+\nIIII\n@a/2\nCCCC\n+\nIIII\n")
    (c1, c2), = list(fastq.read_pairs(pi, None, max_len=8))
    assert np.array_equal(c1.codes, b1.codes)
    assert np.array_equal(c2.codes, b2.codes)


def test_read_truncation_warns(tmp_path, capsys):
    p = tmp_path / "r.fq"
    p.write_text("@a\n" + "A" * 300 + "\n+\n" + "I" * 300 + "\n")
    b = next(fastq.read_single(p, max_len=128))
    assert b.lens[0] == 128


def test_succinct_roundtrip(tmp_path, small_index):
    path = tmp_path / "o.gout"
    w = SuccinctWriter(path, small_index)
    w.write(SamRecord(qname=b"q1", flag=16, chrom=1, pos=99, mapq=37,
                      cigar="50M", seq=b"A" * 50, qual=None,
                      tags=["NM:i:2"]))
    w.close()
    names, lens, recs = read_succinct(path)
    assert names == small_index.names
    assert recs == [(b"q1", 16, 1, 99, 37, "50M", 2)]


def test_bam_container(tmp_path, small_index):
    path = tmp_path / "o.bam"
    w = BamWriter(path, small_index)
    w.write(SamRecord(qname=b"q1", flag=0, chrom=0, pos=10, mapq=37,
                      cigar="4M", seq=b"ACGT", qual=b"IIII",
                      tags=["NM:i:0", "MD:Z:4"]))
    w.close()
    raw = gzip.decompress(path.read_bytes())
    assert raw[:4] == b"BAM\x01"
    (ltext,) = struct.unpack_from("<i", raw, 4)
    (nref,) = struct.unpack_from("<i", raw, 8 + ltext)
    assert nref == len(small_index.names)
    # first alignment block parses
    off = 12 + ltext
    for _ in range(nref):
        (lname,) = struct.unpack_from("<i", raw, off)
        off += 8 + lname
    (bsize,) = struct.unpack_from("<i", raw, off)
    refid, pos, lqname, mapq = struct.unpack_from("<iiBB", raw, off + 4)
    assert (refid, pos, mapq) == (0, 10, 37)
    qname = raw[off + 4 + 32: off + 4 + 32 + lqname - 1]
    assert qname == b"q1"


def test_ini_loading(tmp_path):
    from soap3dp_tpu.cli.ini import load_ini_options
    p = tmp_path / "soap3-dp.ini"
    p.write_text("""[Alignment]
MaxOutputPerRead=55
Soap3MisMatchAllow=3
[PairEnd]
StrandArrangement=-/+
[DP]
MatchScore=2
DPScoreThreshold=30
[Score]
BWALikeScore=0
[Clipping]
MaxFrontLenClipped=10
""")
    o = load_ini_options(str(p))
    assert o.max_output_per_read == 55
    assert o.soap3_mismatch_allow == 3
    assert (o.strand_left_leg, o.strand_right_leg) == (1, 0)
    assert o.match_score == 2
    assert o.dp_score_threshold == 30
    assert o.bwa_like_score is False
    assert o.max_front_clip == 10


def test_mapq_reference_values():
    """Spot values derived from the reference formulas (BGS-IO.cpp)."""
    from soap3dp_tpu.pipeline import mapq
    assert mapq.bwa_like_single(1, 0) == 37
    assert mapq.bwa_like_single(2, 0) == 0
    assert mapq.bwa_like_single(1, 1) == 23   # g_log_n[1] = 0
    assert mapq.bwa_like_single(1, 2) == 20   # g_log_n[2] = 3
    assert mapq.bwa_like_single(1, 255) == 0  # 23 < g_log_n[255]
    m0, m1 = mapq.bwa_like_pair(1, 0, 1, 0, 100, 1, 0, 0, 100, 100)
    assert (m0, m1) == (60, 60)  # 37+37 capped
    m0, m1 = mapq.bwa_like_pair(2, 0, 1, 0, 195, 1, 0, 0, 100, 100)
    assert m0 == min(29 + 7, 37) and m1 == 37


def test_native_reader_matches_python(tmp_path):
    """The C++ QueryParser analog must produce identical batches."""
    import gzip as gz
    import numpy as np
    from soap3dp_tpu.io import fastq, fastq_native

    if not fastq_native.available():
        import pytest
        pytest.skip("no native reader (g++/zlib unavailable)")
    fq = tmp_path / "r.fq"
    rng = np.random.default_rng(2)
    recs = []
    with open(fq, "w") as f:
        for i in range(533):
            L = int(rng.integers(20, 90))
            s = "".join("ACGTN"[c] for c in rng.integers(0, 5, L))
            q = "".join(chr(33 + int(x)) for x in rng.integers(0, 40, L))
            f.write(f"@read{i} extra stuff\n{s}\n+\n{q}\n")
            recs.append((f"read{i}".encode(), s, q))
    # also gzip variant
    fqgz = tmp_path / "r.fq.gz"
    with gz.open(fqgz, "wb") as f:
        f.write(open(fq, "rb").read())

    for path in (fq, fqgz):
        import os
        os.environ["SOAP3DP_NO_NATIVE"] = "1"
        py = list(fastq.read_single(str(path), batch_size=100, max_len=96))
        del os.environ["SOAP3DP_NO_NATIVE"]
        nat = list(fastq.read_single(str(path), batch_size=100, max_len=96))
        assert sum(len(b) for b in nat) == 533
        for bp, bn in zip(py, nat):
            assert list(bp.names) == list(bn.names)
            assert np.array_equal(bp.codes, bn.codes)
            assert np.array_equal(bp.lens, bn.lens)
            assert np.array_equal(bp.quals, bn.quals)


def test_native_reader_fasta(tmp_path):
    import numpy as np
    from soap3dp_tpu.io import fastq, fastq_native

    if not fastq_native.available():
        import pytest
        pytest.skip("no native reader")
    fa = tmp_path / "r.fa"
    with open(fa, "w") as f:
        f.write(">a desc\nACGT\nACGT\n>b\nTTTT\n")
    batches = list(fastq.read_single(str(fa), batch_size=10, max_len=16))
    b = batches[0]
    assert list(b.names) == [b"a", b"b"]
    assert b.lens.tolist() == [8, 4]
    assert b.quals is None
    assert bytes(b.codes[0, :8]) == bytes([0, 1, 2, 3, 0, 1, 2, 3])


def test_native_reader_fasta_multibatch_has_no_quals(tmp_path):
    """FASTA spanning several batches must report quals=None for EVERY
    batch (regression: has_qual was reset to 1 on non-first batches)."""
    from soap3dp_tpu.io import fastq, fastq_native

    if not fastq_native.available():
        import pytest
        pytest.skip("no native reader")
    fa = tmp_path / "many.fa"
    with open(fa, "w") as f:
        for i in range(25):
            f.write(f">r{i}\nACGTACGT\n")
    batches = list(fastq.read_single(str(fa), batch_size=10, max_len=16))
    assert len(batches) == 3
    for b in batches:
        assert b.quals is None


def test_native_reader_corrupt_gzip_raises(tmp_path):
    """A truncated/corrupt gzip must raise, not silently parse short."""
    import gzip as gz
    import pytest
    from soap3dp_tpu.io import fastq, fastq_native

    if not fastq_native.available():
        pytest.skip("no native reader")
    good = tmp_path / "ok.fq.gz"
    payload = b"".join(
        b"@r%d\nACGTACGTACGTACGTACGTACGTACGT\n+\n" % i +
        b"I" * 28 + b"\n" for i in range(2000))
    with gz.open(good, "wb") as f:
        f.write(payload)
    data = good.read_bytes()
    bad = tmp_path / "bad.fq.gz"
    bad.write_bytes(data[: len(data) // 2])  # truncate mid-stream
    with pytest.raises(ValueError):
        for _ in fastq.read_single(str(bad), batch_size=100, max_len=32):
            pass


def test_prefetch_iterator():
    from soap3dp_tpu.io.aio import prefetch

    assert list(prefetch(range(100), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise ValueError("x")

    import pytest
    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_bam_roundtrip(tmp_path, small_index):
    """BamWriter output decodes back through the BAM reader (and
    read_single/read_pairs route BAM automatically)."""
    import numpy as np
    from soap3dp_tpu.io import bamread, fastq
    from soap3dp_tpu.io.sam import SamRecord, FLAG_REVERSE
    from soap3dp_tpu.io.succinct import BamWriter

    path = tmp_path / "t.bam"
    w = BamWriter(str(path), small_index)
    seqs = [b"ACGTACGTAA", b"TTGCAGGTCA", b"GGGTTTACCA", b"CATCATCATC"]
    for i, s in enumerate(seqs):
        flag = FLAG_REVERSE if i == 1 else 0
        w.write(SamRecord(qname=b"q%d" % i, flag=flag, chrom=0, pos=10 * i,
                          mapq=37, cigar=f"{len(s)}M", seq=s,
                          qual=b"I" * len(s)))
    w.close()
    assert bamread.is_bam(path)
    got = list(bamread.iter_bam_reads(path))
    assert [g[0] for g in got] == [b"q0", b"q1", b"q2", b"q3"]
    from soap3dp_tpu.utils import dna
    for (name, codes, qual), s in zip(got, seqs):
        # writer stores reverse-strand reads revcomped; reader flips back
        assert dna.decode(codes) == s
        assert qual == b"I" * len(s)
    # batch APIs route BAM automatically
    batches = list(fastq.read_single(str(path), batch_size=3, max_len=16))
    assert sum(len(b) for b in batches) == 4
    prs = list(fastq.read_pairs(str(path), None, batch_size=2, max_len=16))
    assert sum(len(b1) for b1, _ in prs) == 2
    b1, b2 = prs[0]
    assert b1.names[0] == b"q0" and b2.names[0] == b"q1"


def test_succinct_write_block_matches_write(tmp_path, small_index):
    """Columnar block serialization is byte-compatible with write()."""
    import numpy as np
    from soap3dp_tpu.io.sam import SamRecord
    from soap3dp_tpu.io.succinct import SuccinctWriter, read_succinct

    names = [b"a1", b"b22", b"c333", b"d"]
    flags = [99, 147, 83, 163]
    chroms = [0, 0, 0, 0]
    poss = [10, 20, 4000000000, 40]
    mapqs = [60, 60, 37, 0]
    cigars = [b"50M", b"50M", b"30M3D17M", b"50M"]
    nms = [0, 1, -1, 2]

    p1 = tmp_path / "a.gout"
    w = SuccinctWriter(str(p1), small_index)
    for i in range(4):
        w.write(SamRecord(qname=names[i], flag=flags[i], chrom=chroms[i],
                          pos=poss[i], mapq=mapqs[i],
                          cigar=cigars[i].decode(), seq=b"*", qual=None,
                          tags=[f"NM:i:{nms[i]}"]))
    w.close()
    p2 = tmp_path / "b.gout"
    w2 = SuccinctWriter(str(p2), small_index)
    w2.write_block(names, flags, chroms, poss, mapqs, cigars, nms)
    w2.close()
    assert open(p1, "rb").read() == open(p2, "rb").read()
    ns, ls, recs = read_succinct(str(p2))
    assert [r[0] for r in recs] == names
    assert [r[3] for r in recs] == poss
    assert [r[6] for r in recs] == nms


def test_sam_block_writer_matches_per_record(tmp_path, small_index,
                                             small_device_index,
                                             small_genome, rng):
    """The columnar SAM write_block path must emit byte-identical text
    to the per-record SamRecord path (VERDICT r1 item 6)."""
    import numpy as np
    from soap3dp_tpu.io.fastq import ReadBatch
    from soap3dp_tpu.io.sam import SamWriter
    from soap3dp_tpu.pipeline.options import AlignOptions
    from soap3dp_tpu.pipeline.pair import align_pair_batch

    codes = small_genome.codes
    L, insert, n = 40, 120, 25
    pos = rng.integers(0, len(codes) - insert - 1, n)
    left = np.stack([codes[p:p + L] for p in pos])
    right = np.stack([(3 - codes[p + insert - L:p + insert])[::-1]
                      for p in pos])
    left[0, 5] = (left[0, 5] + 1) % 4
    quals = rng.integers(33, 73, (n, L)).astype(np.uint8)
    names = [b"q%d" % i for i in range(n)]
    lens = np.full(n, L, np.int32)
    b1 = ReadBatch(names, np.ascontiguousarray(left), lens, quals.copy())
    b2 = ReadBatch(names, np.ascontiguousarray(right), lens.copy(),
                   quals.copy())
    opts = AlignOptions(min_insert=60, max_insert=240)

    class SlowSam(SamWriter):
        write_block = property()  # hide: hasattr() -> AttributeError

    out = {}
    for cls, tag in ((SamWriter, "fast"), (SlowSam, "slow")):
        p = tmp_path / f"{tag}.sam"
        w = cls(str(p), small_index)
        align_pair_batch(small_index, small_device_index, b1, b2, opts, w)
        w.close()
        out[tag] = p.read_text()
    assert out["fast"] == out["slow"]
    assert "X0:i:" in out["fast"]


def test_sam_native_formatter_matches_numpy(tmp_path, small_index, rng,
                                            monkeypatch):
    """The C formatter and the numpy assembly emit identical bytes,
    including ragged read lengths, reverse-complemented lanes and the
    X0/X1/XM tag block."""
    import numpy as np
    from soap3dp_tpu.io import sam_native
    from soap3dp_tpu.io.sam import SamWriter

    if not sam_native.available():
        import pytest
        pytest.skip("no native compiler")

    n, L = 64, 50
    names = [b"r%d" % i for i in range(n)]
    flags = rng.choice([0x63, 0x53, 0x93, 0xA3], n)
    chroms = np.zeros(n, np.int64)
    poss = rng.integers(0, 10_000, n)
    mapqs = rng.integers(0, 60, n)
    lens = rng.integers(20, L + 1, n).astype(np.int64)
    cigars = [b"%dM" % l for l in lens]
    seq = rng.integers(0, 4, (n, L)).astype(np.uint8)
    quals = rng.integers(33, 73, (n, L)).astype(np.uint8)
    tags = (rng.integers(1, 5, n), rng.integers(0, 3, n),
            rng.integers(0, 4, n))
    args = (names, flags, chroms, poss, mapqs, cigars,
            np.zeros(n, np.int32))
    kw = dict(mate_chroms=chroms, mate_poss=poss[::-1].copy(),
              tlens=rng.integers(-500, 500, n), seq_codes=seq,
              seq_lens=lens, quals=quals, tags=tags)
    outs = {}
    for tag, native in (("native", True), ("numpy", False)):
        if not native:
            monkeypatch.setattr(sam_native, "available", lambda: False)
        p = tmp_path / f"{tag}.sam"
        w = SamWriter(str(p), small_index)
        w.write_block(*args, **kw)
        w.close()
        outs[tag] = p.read_bytes()
    assert outs["native"] == outs["numpy"]


def test_sam_hotpath_forms_match_numpy(tmp_path, small_index, rng,
                                       monkeypatch):
    """The hot-path write_block forms (cigars=None gapless, 'S'-array
    names, two-source seq/qual matrices with seq_src row indices, and
    the bare-matrix + seq_src SE form) emit byte-identical text on the
    C and numpy paths (VERDICT r3 #4)."""
    import numpy as np
    from soap3dp_tpu.io import sam_native
    from soap3dp_tpu.io.sam import SamWriter

    if not sam_native.available():
        import pytest
        pytest.skip("no native compiler")

    n, L1, L2 = 64, 50, 44
    names = np.array([b"pair_%04d/%d" % (i // 2, i % 2 + 1)
                      for i in range(n)])
    flags = rng.choice([0x63, 0x53, 0x93, 0xA3], n)
    chroms = np.zeros(n, np.int64)
    poss = rng.integers(0, 10_000, n)
    mapqs = rng.integers(0, 60, n)
    m1 = rng.integers(0, 4, (n // 2, L1)).astype(np.uint8)
    m2 = rng.integers(0, 4, (n // 2, L2)).astype(np.uint8)
    q1 = rng.integers(33, 73, (n // 2, L1)).astype(np.uint8)
    q2 = rng.integers(33, 73, (n // 2, L2)).astype(np.uint8)
    src = np.empty(n, np.int64)
    src[0::2] = np.arange(n // 2)
    src[1::2] = ~np.arange(n // 2)
    lens = np.where(src >= 0,
                    rng.integers(20, L1 + 1, n),
                    rng.integers(20, L2 + 1, n)).astype(np.int64)
    tags = (rng.integers(1, 5, n), rng.integers(0, 3, n),
            rng.integers(0, 4, n))
    tlens = rng.integers(-500, 500, n)
    cases = {
        "pe2src": dict(seq_codes=(m1, m2), quals=(q1, q2), seq_src=src),
        "se1src": dict(seq_codes=np.vstack([m1, m1]),
                       quals=np.vstack([q1, q1]),
                       seq_src=np.abs(src)),
    }
    for case, seqkw in cases.items():
        outs = {}
        for tag, native in (("native", True), ("numpy", False)):
            mp = monkeypatch if not native else None
            if mp:
                mp.setattr(sam_native, "available", lambda: False)
            p = tmp_path / f"{case}_{tag}.sam"
            w = SamWriter(str(p), small_index)
            w.write_block(names, flags, chroms, poss, mapqs, None,
                          np.zeros(n, np.int32), mate_chroms=chroms,
                          mate_poss=poss[::-1].copy(), tlens=tlens,
                          seq_lens=lens, tags=tags, **seqkw)
            w.close()
            outs[tag] = p.read_bytes()
            if mp:
                mp.undo()
        assert outs["native"] == outs["numpy"], case
        # gapless cigars really are "<len>M"
        line0 = outs["native"].splitlines()[-1].split(b"\t")
        assert line0[5] == b"%dM" % lens[-1]


def test_reg2bin():
    from soap3dp_tpu.io.succinct import reg2bin

    assert reg2bin(0, 1) == 4681
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert reg2bin(0, (1 << 14) + 1) == 585
    assert reg2bin(0, (1 << 26) + 1) == 0
    assert reg2bin(9_000_000, 9_000_100) == 4681 + (9_000_000 >> 14)


def test_bam_block_writer_matches_per_record(tmp_path, small_index,
                                             small_device_index,
                                             small_genome, rng):
    """The columnar BAM write_block path emits byte-identical binary to
    the per-record SamRecord path (no SAM-text round trip)."""
    import numpy as np
    from soap3dp_tpu.io.fastq import ReadBatch
    from soap3dp_tpu.io.succinct import BamWriter
    from soap3dp_tpu.pipeline.options import AlignOptions
    from soap3dp_tpu.pipeline.pair import align_pair_batch

    codes = small_genome.codes
    L, insert, n = 40, 120, 25
    pos = rng.integers(0, len(codes) - insert - 1, n)
    left = np.stack([codes[p:p + L] for p in pos])
    right = np.stack([(3 - codes[p + insert - L:p + insert])[::-1]
                      for p in pos])
    left[0, 5] = (left[0, 5] + 1) % 4
    quals = rng.integers(33, 73, (n, L)).astype(np.uint8)
    names = [b"q%d" % i for i in range(n)]
    lens = np.full(n, L, np.int32)
    opts = AlignOptions(min_insert=60, max_insert=240)

    class SlowBam(BamWriter):
        write_block = property()  # hide: hasattr() -> AttributeError

    for q in (quals, None):
        out = {}
        for cls, tag in ((BamWriter, "fast"), (SlowBam, "slow")):
            b1 = ReadBatch(names, np.ascontiguousarray(left), lens,
                           None if q is None else q.copy())
            b2 = ReadBatch(names, np.ascontiguousarray(right), lens.copy(),
                           None if q is None else q.copy())
            p = tmp_path / f"{tag}.bam"
            w = cls(str(p), small_index)
            align_pair_batch(small_index, small_device_index, b1, b2, opts, w)
            w.close()
            out[tag] = p.read_bytes()
        assert out["fast"] == out["slow"], \
            f"BAM block path diverges (quals={'yes' if q is not None else 'no'})"


def test_bam_block_writer_ragged_lengths(tmp_path, small_index, rng):
    """Direct write_block with per-record lengths (odd + even) and
    reverse flags matches the per-record path byte for byte."""
    import numpy as np
    from soap3dp_tpu.io.sam import FLAG_REVERSE, SamRecord
    from soap3dp_tpu.io.succinct import BamWriter
    from soap3dp_tpu.utils import dna

    n, L = 12, 21
    lens = rng.integers(11, L + 1, n).astype(np.int64)
    codes = rng.integers(0, 4, (n, L)).astype(np.uint8)
    codes[np.arange(L)[None, :] >= lens[:, None]] = 0
    quals = rng.integers(33, 73, (n, L)).astype(np.uint8)
    flags = np.where(np.arange(n) % 2 == 0, 0x63, 0x53).astype(np.int64)
    poss = rng.integers(0, 5_000_000, n).astype(np.int64)
    names = [b"rg%d" % i for i in range(n)]
    x0 = rng.integers(1, 5, n)
    x1 = rng.integers(0, 3, n)
    xm = rng.integers(0, 3, n)

    p1, p2 = tmp_path / "a.bam", tmp_path / "b.bam"
    w1 = BamWriter(str(p1), small_index)
    for i in range(n):
        li = int(lens[i])
        w1.write(SamRecord(
            qname=names[i], flag=int(flags[i]), chrom=0, pos=int(poss[i]),
            mapq=37, cigar=f"{li}M",
            seq=dna.decode(codes[i, :li]),
            qual=bytes(quals[i, :li]),
            mate_chrom=0, mate_pos=int(poss[i]) + 50, tlen=71,
            tags=[f"X0:i:{x0[i]}", f"X1:i:{x1[i]}", f"XM:i:{xm[i]}",
                  "XO:i:0", "XG:i:0"]))
    w1.close()

    w2 = BamWriter(str(p2), small_index)
    w2.write_block(
        names, flags, np.zeros(n, np.int32), poss,
        np.full(n, 37, np.uint8),
        [b"%dM" % l for l in lens], np.zeros(n, np.int32),
        mate_chroms=np.zeros(n, np.int32), mate_poss=poss + 50,
        tlens=np.full(n, 71, np.int64),
        seq_codes=codes, seq_lens=lens, quals=quals,
        tags=(x0, x1, xm))
    w2.close()
    assert p1.read_bytes() == p2.read_bytes()


def test_reg2bin_vec_matches_scalar(rng):
    from soap3dp_tpu.io.succinct import reg2bin, reg2bin_vec

    beg = np.concatenate([
        rng.integers(0, 1 << 28, 500),
        np.asarray([0, 1, (1 << 14) - 1, 1 << 14, (1 << 17) - 2, 1 << 26])])
    end = beg + np.concatenate([rng.integers(1, 300, 500),
                                np.asarray([1, 100, 3, 2, 4, 1])])
    vec = reg2bin_vec(beg, end)
    for i in range(len(beg)):
        assert vec[i] == reg2bin(int(beg[i]), int(end[i])), i


def test_bam_block_writer_single_end(tmp_path, small_index, rng):
    """Single-end block writes (no mate columns) match the per-record
    path: next_refID/-pos = -1, tlen = 0."""
    from soap3dp_tpu.io.sam import SamRecord
    from soap3dp_tpu.io.succinct import BamWriter
    from soap3dp_tpu.utils import dna

    n, L = 8, 16
    codes = rng.integers(0, 4, (n, L)).astype(np.uint8)
    poss = rng.integers(0, 1_000_000, n).astype(np.int64)
    names = [b"s%d" % i for i in range(n)]

    p1, p2 = tmp_path / "a.bam", tmp_path / "b.bam"
    w1 = BamWriter(str(p1), small_index)
    for i in range(n):
        w1.write(SamRecord(
            qname=names[i], flag=0, chrom=0, pos=int(poss[i]), mapq=23,
            cigar=f"{L}M", seq=dna.decode(codes[i]), qual=None,
            tags=["X0:i:1", "X1:i:0", "XM:i:0", "XO:i:0", "XG:i:0"]))
    w1.close()
    w2 = BamWriter(str(p2), small_index)
    w2.write_block(names, np.zeros(n, np.int64), np.zeros(n, np.int32),
                   poss, np.full(n, 23, np.uint8), [b"%dM" % L] * n,
                   np.zeros(n, np.int32), seq_codes=codes,
                   seq_lens=np.full(n, L, np.int64),
                   tags=(np.ones(n), np.zeros(n), np.zeros(n)))
    w2.close()
    assert p1.read_bytes() == p2.read_bytes()


def test_sam_native_long_reference_names(tmp_path, rng, monkeypatch):
    """Reference names longer than the per-record slack must not
    overflow the native formatter's output buffer (they are written
    twice per record: RNAME and, for inter-chromosome mates, RNEXT) —
    the capacity estimate has to count them."""
    import numpy as np
    from soap3dp_tpu.index.builder import build_index
    from soap3dp_tpu.index.packing import PackedGenome
    from soap3dp_tpu.io import sam_native
    from soap3dp_tpu.io.sam import SamWriter
    from soap3dp_tpu.utils import dna

    if not sam_native.available():
        import pytest
        pytest.skip("no native compiler")

    glen = 4000
    codes = rng.integers(0, 4, glen).astype(np.uint8)
    long1 = "scaffold_" + "x" * 400 + "_A"
    long2 = "scaffold_" + "y" * 400 + "_B"
    genome = PackedGenome(
        codes=codes, pac=dna.pack_codes(codes), length=glen,
        names=[long1, long2],
        offsets=np.asarray([0, glen // 2, glen], np.uint64),
        amb_starts=np.zeros(0, np.uint64), amb_lengths=np.zeros(0, np.uint64))
    index = build_index(genome, sa_rate=8, lut_k=6)

    n, L = 32, 40
    names = np.array([b"q%d" % i for i in range(n)])
    flags = np.full(n, 0x63, np.int64)
    chroms = (np.arange(n) % 2).astype(np.int64)
    poss = rng.integers(0, 1000, n)
    lens = np.full(n, L, np.int64)
    args = (names, flags, chroms, poss, np.full(n, 60, np.int64),
            [b"%dM" % L] * n, np.zeros(n, np.int32))
    kw = dict(mate_chroms=1 - chroms, mate_poss=poss,  # inter-chrom mates
              tlens=np.zeros(n, np.int64),
              seq_codes=rng.integers(0, 4, (n, L)).astype(np.uint8),
              seq_lens=lens, quals=None, tags=None)
    outs = {}
    for tag, native in (("native", True), ("numpy", False)):
        if not native:
            monkeypatch.setattr(sam_native, "available", lambda: False)
        p = tmp_path / f"{tag}.sam"
        w = SamWriter(str(p), index)
        w.write_block(*args, **kw)
        w.close()
        outs[tag] = p.read_bytes()
    assert outs["native"] == outs["numpy"]
    assert long1.encode() in outs["native"]
