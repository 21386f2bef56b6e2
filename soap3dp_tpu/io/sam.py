"""SAM output: header, flags, records, tags.

Replaces the reference's samtools-backed SAM/BAM emission
(SAMOutputHeaderConstruct, SAM.cpp:82-140; record assembly + tags
BGS-IO.cpp:2131-2273). Same header shape (@HD VN:1.3 SO:unsorted, @RG,
@SQ per sequence, @PG) and the same optional-tag vocabulary:

  X0 (#best hits), X1 (#suboptimal hits), XM/XO/XG (mismatch / gap-open
  / gap-extend counts), XA:Z (alternative hits "chr,(+|-)pos,CIGAR,NM;"),
  and MD:Z + NM:i when the -p option is on.

Records are plain SAM text; BAM output is produced by piping through
the bgzf writer in soap3dp_tpu.io.succinct (round-tripping via text).
"""

from __future__ import annotations

import dataclasses
import io
import os
from typing import Sequence

import numpy as np

from soap3dp_tpu.index.builder import Index
from soap3dp_tpu.utils import dna
from soap3dp_tpu.version import __version__

# SAM flag bits
FLAG_PAIRED = 0x1
FLAG_PROPER = 0x2
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_FIRST = 0x40
FLAG_SECOND = 0x80

COMP = bytes.maketrans(b"ACGTNacgtn", b"TGCANtgcan")


def revcomp_ascii(seq: bytes) -> bytes:
    return seq.translate(COMP)[::-1]


@dataclasses.dataclass
class SamRecord:
    qname: bytes
    flag: int
    chrom: int          # chromosome id, -1 = unmapped
    pos: int            # 0-based within chromosome
    mapq: int
    cigar: str          # "" = *
    seq: bytes          # forward-strand read sequence (ASCII)
    qual: bytes | None
    mate_chrom: int = -1
    mate_pos: int = 0
    tlen: int = 0
    tags: list[str] = dataclasses.field(default_factory=list)


class SamWriter:
    """Streaming SAM text writer."""

    def __init__(self, out, index: Index, read_group: str = "default",
                 sample: str = "default", rg_option: str = ""):
        self._own = isinstance(out, (str, os.PathLike))
        self._fh = open(out, "wb") if self._own else out
        self.index = index
        self.names = [n.encode() for n in index.names]
        lens = np.diff(index.offsets).astype(np.int64)
        header = [b"@HD\tVN:1.3\tSO:unsorted"]
        rg = f"@RG\tID:{read_group}\tSM:{sample}"
        if rg_option:
            rg += "\t" + rg_option
        header.append(rg.encode())
        for name, ln in zip(self.names, lens):
            header.append(b"@SQ\tSN:" + name + f"\tLN:{ln}".encode())
        header.append(f"@PG\tID:soap3dp-tpu\tPN:soap3dp-tpu\tVN:{__version__}".encode())
        self._fh.write(b"\n".join(header) + b"\n")

    def write(self, rec: SamRecord) -> None:
        rname = self.names[rec.chrom] if rec.chrom >= 0 else b"*"
        if rec.mate_chrom < 0:
            rnext, pnext = b"*", 0
        elif rec.mate_chrom == rec.chrom:
            rnext, pnext = b"=", rec.mate_pos + 1
        else:
            rnext, pnext = self.names[rec.mate_chrom], rec.mate_pos + 1
        if rec.flag & FLAG_REVERSE and not rec.flag & FLAG_UNMAPPED:
            seq = revcomp_ascii(rec.seq)
            qual = rec.qual[::-1] if rec.qual else b"*"
        else:
            seq = rec.seq
            qual = rec.qual if rec.qual else b"*"
        fields = [
            rec.qname,
            str(rec.flag).encode(),
            rname,
            str(rec.pos + 1 if rec.chrom >= 0 else 0).encode(),
            str(rec.mapq).encode(),
            rec.cigar.encode() if rec.cigar else b"*",
            rnext,
            str(pnext).encode(),
            str(rec.tlen).encode(),
            seq,
            qual,
        ]
        fields.extend(t.encode() for t in rec.tags)
        self._fh.write(b"\t".join(fields) + b"\n")

    def close(self) -> None:
        if self._own:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def translate_pos(index: Index, tp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Absolute text position -> (chrom id, 0-based offset)."""
    tp = np.asarray(tp, dtype=np.uint64)
    chrom = (np.searchsorted(index.offsets, tp, side="right") - 1).astype(np.int32)
    off = (tp - index.offsets[np.maximum(chrom, 0)]).astype(np.int64)
    return chrom, off


def crosses_boundary(index: Index, tp: np.ndarray, length: np.ndarray) -> np.ndarray:
    """True where [tp, tp+length) spans a chromosome boundary or an
    excluded ambiguity region (README.md section 2.1: regions with more
    than 10 invalid characters are not aligned against)."""
    tp = np.asarray(tp, dtype=np.uint64)
    end = tp + np.asarray(length, dtype=np.uint64) - 1
    c1 = np.searchsorted(index.offsets, tp, side="right")
    c2 = np.searchsorted(index.offsets, end, side="right")
    bad = c1 != c2
    if len(index.amb_starts):
        # overlap if tp <= amb_end-1 and end >= amb_start
        i1 = np.searchsorted(index.amb_ends, tp, side="right")
        i2 = np.searchsorted(index.amb_starts, end, side="right")
        bad |= i2 > i1
    return bad


def mismatch_md(index: Index, tp: int, read_codes: np.ndarray) -> tuple[str, int]:
    """MD string + NM for a gapless alignment at absolute position tp."""
    L = len(read_codes)
    w0, w1 = int(tp) // 16, (int(tp) + L + 15) // 16
    gcodes = dna.unpack_words(np.asarray(index.pac[w0:w1 + 1]),
                              (w1 + 1 - w0) * 16)[int(tp) % 16:][:L]
    mism = np.flatnonzero(gcodes != read_codes)
    md = []
    last = 0
    for p in mism:
        md.append(str(p - last))
        md.append(chr(dna.CODE_TO_CHAR[gcodes[p]]))
        last = p + 1
    md.append(str(L - last))
    return "".join(md), len(mism)


def xa_entry(chrom_name: bytes, strand: int, pos: int, cigar: str, nm: int) -> str:
    """One XA:Z alternative-hit entry."""
    return f"{chrom_name.decode()},{'-' if strand else '+'}{pos + 1},{cigar},{nm};"
