"""CLI surface tests: builder -> aligner -> viewer, in-process."""

import numpy as np
import pytest

from soap3dp_tpu.utils import dna


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """A genome FASTA, its index, and read files."""
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(99)
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    seq = dna.decode(codes).decode()
    fa = d / "g.fa"
    with open(fa, "w") as f:
        f.write(">chrA\n")
        for i in range(0, len(seq), 60):
            f.write(seq[i:i + 60] + "\n")

    from soap3dp_tpu.cli.builder import main as builder_main
    assert builder_main([str(fa)]) == 0

    B, L, INS = 12, 80, 250
    pos = rng.integers(0, 30000 - INS - 1, B)
    with open(d / "r1.fq", "w") as f1, open(d / "r2.fq", "w") as f2, \
            open(d / "s.fq", "w") as fs:
        for b in range(B):
            left = codes[pos[b]:pos[b] + L].copy()
            left[11] = (left[11] + 1) % 4
            right = dna.revcomp_codes(codes[pos[b] + INS - L:pos[b] + INS])
            sl = dna.decode(left).decode()
            sr = dna.decode(right).decode()
            f1.write(f"@p{b}\n{sl}\n+\n{'I' * L}\n")
            f2.write(f"@p{b}\n{sr}\n+\n{'I' * L}\n")
            fs.write(f"@p{b}\n{sl}\n+\n{'I' * L}\n")
    return d, pos, B, L, INS


def test_cli_single_sam(workdir):
    d, pos, B, L, INS = workdir
    from soap3dp_tpu.cli.main import main
    rc = main(["single", str(d / "g.fa.index"), str(d / "s.fq"),
               "-o", str(d / "out_s")])
    assert rc == 0
    assert (d / "out_s.done").exists()
    recs = [l.split("\t") for l in open(d / "out_s.sam") if not l.startswith("@")]
    assert len(recs) == B
    byname = {r[0]: r for r in recs}
    for b in range(B):
        assert int(byname[f"p{b}"][3]) == pos[b] + 1


def test_cli_pair_succinct_and_view(workdir, capsys):
    d, pos, B, L, INS = workdir
    from soap3dp_tpu.cli.main import main
    rc = main(["pair", str(d / "g.fa.index"), str(d / "r1.fq"),
               str(d / "r2.fq"), "-v", "100", "-u", "400",
               "-b", "1", "-o", str(d / "out_p")])
    assert rc == 0
    from soap3dp_tpu.cli.view import main as view_main
    assert view_main([str(d / "out_p.gout")]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l and not l.startswith("@")]
    assert len(lines) == 2 * B
    assert any("chrA" in l for l in lines)


def test_cli_pair_bam_output(workdir):
    d, pos, B, L, INS = workdir
    from soap3dp_tpu.cli.main import main
    rc = main(["pair", str(d / "g.fa.index"), str(d / "r1.fq"),
               str(d / "r2.fq"), "-v", "100", "-u", "400",
               "-b", "3", "-o", str(d / "out_b")])
    assert rc == 0
    from soap3dp_tpu.io import bamread
    assert bamread.is_bam(d / "out_b.bam")
    got = list(bamread.iter_bam_reads(d / "out_b.bam"))
    assert len(got) == 2 * B


def test_cli_pair_multi(workdir):
    d, pos, B, L, INS = workdir
    lst = d / "list.txt"
    with open(lst, "w") as f:
        f.write(f"{d}/r1.fq\t{d}/r2.fq\t100\t400\t{d}/out_m\trg1\tsampleX\n")
    from soap3dp_tpu.cli.main import main
    rc = main(["pair-multi", str(d / "g.fa.index"), str(lst)])
    assert rc == 0
    header = [l for l in open(d / "out_m.sam") if l.startswith("@RG")]
    assert "ID:rg1" in header[0] and "SM:sampleX" in header[0]
    recs = [l for l in open(d / "out_m.sam") if not l.startswith("@")]
    assert len(recs) == 2 * B


def test_cli_pair_devices_mesh(workdir):
    """`--devices 8` (the multi-chip CLI path, VERDICT r2 weak-8) must
    emit exactly the records of the default single-device run — same
    alignments, positions, flags and MAPQ — on the virtual CPU mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    d, pos, B, L, INS = workdir
    from soap3dp_tpu.cli.main import main

    def records(prefix, extra=()):
        rc = main(["pair", str(d / "g.fa.index"), str(d / "r1.fq"),
                   str(d / "r2.fq"), "-v", "100", "-u", "400",
                   *extra, "-o", str(d / prefix)])
        assert rc == 0
        return sorted(l for l in open(d / (prefix + ".sam"))
                      if not l.startswith("@"))

    single = records("out_d1")
    mesh = records("out_d8", ["--devices", "8"])
    assert mesh == single


def test_cli_bam_input(workdir, tmp_path):
    """Aligning FROM a BAM file (the reference's `-bam` input mode,
    QueryParser.cpp:27 loadBAMReads; we auto-detect by magic): same
    records as the FASTQ run."""
    d, pos, B, L, INS = workdir
    from soap3dp_tpu.cli.main import main
    from soap3dp_tpu.index.builder import load_index
    from soap3dp_tpu.io.fastq import read_single
    from soap3dp_tpu.io.succinct import BamWriter
    from soap3dp_tpu.io.sam import FLAG_UNMAPPED, SamRecord
    from soap3dp_tpu.utils import dna

    # write s.fq's reads into an unaligned BAM
    inbam = tmp_path / "in.bam"
    idx = load_index(d / "g.fa.index.t3i")
    w = BamWriter(inbam, idx)
    for batch in read_single(str(d / "s.fq"), batch_size=1 << 20,
                             max_len=L):
        for i in range(len(batch)):
            w.write(SamRecord(
                qname=bytes(batch.names[i]), flag=FLAG_UNMAPPED, chrom=-1,
                pos=-1, mapq=0, cigar="",
                seq=dna.decode(batch.codes[i, :batch.lens[i]]),
                qual=b"I" * int(batch.lens[i])))
    w.close()

    assert main(["single", str(d / "g.fa.index"), str(inbam),
                 "-o", str(tmp_path / "ob")]) == 0

    def recs(p):
        return sorted(l.split("\t")[:6] for l in open(p)
                      if not l.startswith("@"))

    assert main(["single", str(d / "g.fa.index"), str(d / "s.fq"),
                 "-o", str(tmp_path / "of")]) == 0
    assert recs(tmp_path / "ob.sam") == recs(tmp_path / "of.sam")


def test_cli_multi_chromosome_and_boundaries(tmp_path):
    """3-chromosome genome: reads report the right (chrom, pos); a read
    spanning a chromosome boundary must never be placed across it
    (reference: boundary hits are filtered against the ambiguity/
    annotation tables, 2bwt-lib/HSP.c coordinate semantics)."""
    rng = np.random.default_rng(123)
    lens = [9000, 7000, 11000]
    seqs = [rng.integers(0, 4, n).astype(np.uint8) for n in lens]
    fa = tmp_path / "m.fa"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">ctg{i} extra header words\n")
            t = dna.decode(s).decode()
            for j in range(0, len(t), 60):
                f.write(t[j:j + 60] + "\n")
    from soap3dp_tpu.cli.builder import main as bmain
    assert bmain([str(fa)]) == 0

    L = 80
    fq = tmp_path / "m.fq"
    want = {}
    with open(fq, "w") as f:
        k = 0
        for i, s in enumerate(seqs):
            for p in (0, len(s) // 2, len(s) - L):
                name = f"m{k}"
                want[name] = (f"ctg{i}", p)
                f.write(f"@{name}\n{dna.decode(s[p:p+L]).decode()}\n"
                        f"+\n{'I'*L}\n")
                k += 1
        # straddles the ctg0/ctg1 boundary in concatenated coordinates
        straddle = np.concatenate([seqs[0][-40:], seqs[1][:40]])
        f.write(f"@cross\n{dna.decode(straddle).decode()}\n+\n{'I'*L}\n")
    from soap3dp_tpu.cli.main import main
    assert main(["single", str(fa) + ".index", str(fq),
                 "-o", str(tmp_path / "om")]) == 0
    recs = {}
    for l in open(tmp_path / "om.sam"):
        if l.startswith("@"):
            continue
        f_ = l.rstrip("\n").split("\t")
        recs.setdefault(f_[0], []).append(f_)
    for name, (chrom, p) in want.items():
        r = recs[name][0]
        assert (r[2], int(r[3]) - 1) == (chrom, p), (name, r[:4])
    # the boundary read must be unmapped or clipped/DP-placed WITHIN one
    # chromosome — never a full-length gapless match at the junction
    for r in recs.get("cross", []):
        flag = int(r[1])
        if flag & 0x4:
            continue
        assert r[5] != f"{L}M", r[:6]


def test_cli_bad_inputs_exit_cleanly(workdir, tmp_path, capsys):
    """User-input failures (missing file, truncated FASTQ, mismatched
    pair files, non-FASTA genome) print one diagnostic line and return
    rc=1 — never a traceback (reference CLI behavior)."""
    d, pos, B, L, INS = workdir
    from soap3dp_tpu.cli.main import main

    trunc = tmp_path / "trunc.fq"
    trunc.write_text("@x\nACGT")
    short2 = tmp_path / "short2.fq"
    short2.write_text("@p0\nACGTACGTACGT\n+\nIIIIIIIIIIII\n")
    cases = [
        ["single", str(d / "g.fa.index"), str(tmp_path / "nope.fq"),
         "-o", str(tmp_path / "o1")],
        ["single", str(d / "g.fa.index"), str(trunc),
         "-o", str(tmp_path / "o2")],
        ["pair", str(d / "g.fa.index"), str(d / "r1.fq"), str(short2),
         "-o", str(tmp_path / "o3")],
    ]
    for argv in cases:
        assert main(argv) == 1, argv
        err = capsys.readouterr().err
        assert "error:" in err, argv

    from soap3dp_tpu.cli.builder import main as bmain
    notfa = tmp_path / "x.bin"
    notfa.write_bytes(b"\x00\x01\x02 not a fasta")
    assert bmain([str(notfa)]) == 1
    assert bmain([str(tmp_path / "missing.fa")]) == 1


def test_cli_empty_input_ok(workdir, tmp_path):
    """An empty FASTQ is not an error: 0 reads, valid SAM header out."""
    d, *_ = workdir
    from soap3dp_tpu.cli.main import main
    empty = tmp_path / "empty.fq"
    empty.write_text("")
    rc = main(["single", str(d / "g.fa.index"), str(empty),
               "-o", str(tmp_path / "oe")])
    assert rc == 0
    lines = open(tmp_path / "oe.sam").readlines()
    assert lines and all(l.startswith("@") for l in lines)


def test_ini_options(tmp_path):
    ini = tmp_path / "soap3-dp.ini"
    ini.write_text("""
[Alignment]
MaxOutputPerRead = 77
Soap3MisMatchAllow = 1
[PairEnd]
StrandArrangement = -/+
MaxOutputPerPair = 55
[DP]
MatchScore = 2
MismatchScore = -3
DPScoreThreshold = 17
[Score]
BWALikeScore = 0
MaxMAPQ = 30
[Clipping]
MaxFrontLenClipped = 5
""")
    from soap3dp_tpu.cli.ini import load_ini_options
    o = load_ini_options(str(ini))
    assert o.max_output_per_read == 77
    assert o.soap3_mismatch_allow == 1
    assert (o.strand_left_leg, o.strand_right_leg) == (1, 0)
    assert o.max_output_per_pair == 55
    assert o.match_score == 2 and o.mismatch_score == -3
    assert o.dp_score_threshold == 17
    assert o.bwa_like_score is False
    assert o.max_mapq == 30
    assert o.max_front_clip == 5


def test_cli_illumina13_quals(workdir):
    """-I shifts phred+64 qualities to phred+33 in the SAM output."""
    d, pos, B, L, INS = workdir
    # rewrite s.fq with phred+64 style quals ('h' = Q40+64)
    fq = d / "s64.fq"
    src = open(d / "s.fq").read().splitlines()
    with open(fq, "w") as f:
        for i in range(0, len(src), 4):
            f.write(f"{src[i]}\n{src[i+1]}\n+\n{'h' * len(src[i+1])}\n")
    from soap3dp_tpu.cli.main import main
    rc = main(["single", str(d / "g.fa.index"), str(fq), "-I",
               "-o", str(d / "out_i")])
    assert rc == 0
    recs = [l.split("\t") for l in open(d / "out_i.sam") if not l.startswith("@")]
    # 'h'(104) - 31 = 'I'(73) = Q40 in phred+33
    assert all(set(r[10]) == {"I"} for r in recs)


def test_builder_ini(tmp_path):
    import numpy as np
    from soap3dp_tpu.utils import dna
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, 4000).astype(np.uint8)
    fa = tmp_path / "x.fa"
    fa.write_text(">c\n" + dna.decode(codes).decode() + "\n")
    ini = tmp_path / "b.ini"
    ini.write_text("[BuildIndex]\nSaValueFreq = 4\n")
    from soap3dp_tpu.cli.builder import main as bmain
    assert bmain([str(fa), "--ini", str(ini)]) == 0
    from soap3dp_tpu.index.builder import load_index
    idx = load_index(str(fa) + ".index.t3i")
    assert idx.sa_rate == 4


def test_cli_single_succinct(workdir, capsys):
    d, pos, B, L, INS = workdir
    from soap3dp_tpu.cli.main import main
    rc = main(["single", str(d / "g.fa.index"), str(d / "s.fq"),
               "-b", "1", "-o", str(d / "out_ss")])
    assert rc == 0
    from soap3dp_tpu.io.succinct import read_succinct
    names, lens, recs = read_succinct(str(d / "out_ss.gout"))
    assert len(recs) == B
    by = {r[0]: r for r in recs}
    for b in range(B):
        assert by[b"p%d" % b][3] == pos[b]  # 0-based positions match
