"""Succinct binary output + BAM output.

Succinct format (-b 1): the rebuild's analog of the reference's .gout
binary records (writer OCCFlushCacheDefault, BGS-IO.cpp; decoder
BGS-View.cpp:110-165). Our container:

  magic "T3G1" | u32 num_chroms | per chrom: u16 namelen + u64 length + name
  then records:
  u16 qname_len | qname | u16 flag | i32 chrom | u32 pos | u8 mapq |
  u16 cigar_len | cigar | i32 nm

Decoded back to text by `soap3dp-view` (cli/view.py), the BGS-View
equivalent.

BAM output (-b 3): standard BGZF-compressed BAM v1, written directly
(the reference links samtools-0.1.18 for this; we implement the
container natively). Aux tags are carried as Z-strings and i-ints.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

from soap3dp_tpu.index.builder import Index
from soap3dp_tpu.io.sam import SamRecord, revcomp_ascii, FLAG_REVERSE, FLAG_UNMAPPED
from soap3dp_tpu.version import __version__

MAGIC = b"T3G1"


class SuccinctWriter:
    needs_seq = False   # succinct records carry no SEQ/QUAL
    needs_tags = False  # only NM is stored; emitters skip tag strings

    def __init__(self, path, index: Index, **_kw):
        self._fh = open(path, "wb")
        self._fh.write(MAGIC)
        self._fh.write(struct.pack("<I", len(index.names)))
        lens = np.diff(index.offsets).astype(np.int64)
        for name, ln in zip(index.names, lens):
            nb = name.encode()
            self._fh.write(struct.pack("<HQ", len(nb), int(ln)))
            self._fh.write(nb)

    def write(self, rec: SamRecord) -> None:
        cig = rec.cigar.encode()
        nm = 0
        for t in rec.tags:
            if t.startswith("NM:i:"):
                nm = int(t[5:])
        self._fh.write(struct.pack("<H", len(rec.qname)))
        self._fh.write(rec.qname)
        self._fh.write(struct.pack("<HiIBH", rec.flag, rec.chrom,
                                   rec.pos & 0xFFFFFFFF, rec.mapq, len(cig)))
        self._fh.write(cig)
        self._fh.write(struct.pack("<i", nm))

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def write_block(self, names: list[bytes], flags, chroms, poss, mapqs,
                    cigars: list[bytes] | None, nms, *, seq_lens=None,
                    **_kw) -> None:
        """Columnar bulk write: serialize N records with vectorized
        numpy byte assembly (one Python pass only for the ragged
        name/cigar copies' source concat). The analog of the
        reference's OCC cache flush (OCCFlushCacheDefault) — records
        buffer up and hit the stream in one write.

        cigars=None means gapless "<seq_len>M" (VERDICT r3 #4): the
        all-equal-length case — every gapless fast-path block with
        fixed-length reads — tiles one constant byte string instead of
        formatting N strings."""
        N = len(names)
        if N == 0:
            return
        flags = np.asarray(flags, np.uint16)
        chroms = np.asarray(chroms, np.int32)
        poss = np.asarray(poss, np.uint32)
        mapqs = np.asarray(mapqs, np.uint8)
        nms = np.asarray(nms, np.int32)

        from soap3dp_tpu.io.ragged import (flatten_bytes, offsets_of,
                                           scatter_idx)

        qlen, src = flatten_bytes(names)
        if cigars is None:
            lens_a = np.asarray(seq_lens, np.int64)
            if N and (lens_a == lens_a[0]).all():
                one = b"%dM" % int(lens_a[0])
                clen = np.full(N, len(one), np.int64)
                csrc = np.tile(np.frombuffer(one, np.uint8), N)
            else:
                cigars = np.char.add(lens_a.astype("S11"), b"M")
                clen, csrc = flatten_bytes(cigars)
        else:
            clen, csrc = flatten_bytes(cigars)
        rec_len = 19 + qlen + clen
        off = offsets_of(rec_len)
        buf = np.zeros(off[-1], np.uint8)

        def put_u16(pos, val):
            buf[pos] = val & 0xFF
            buf[pos + 1] = (val >> 8) & 0xFF

        def put_u32(pos, val):
            v = val.astype(np.uint32)
            for k in range(4):
                buf[pos + k] = (v >> (8 * k)).astype(np.uint8)

        o = off[:-1]
        put_u16(o, qlen.astype(np.uint16))
        buf[scatter_idx(o + 2, qlen)] = src  # ragged qname copy
        f0 = o + 2 + qlen
        put_u16(f0, flags)
        put_u32(f0 + 2, chroms.view(np.uint32) if chroms.dtype == np.int32
                else chroms.astype(np.uint32))
        put_u32(f0 + 6, poss)
        buf[f0 + 10] = mapqs
        put_u16(f0 + 11, clen.astype(np.uint16))
        buf[scatter_idx(f0 + 13, clen)] = csrc
        put_u32(f0 + 13 + clen, nms.view(np.uint32))
        self._fh.write(buf.tobytes())


def read_succinct(path):
    """Decode a succinct file -> (names, lengths, records). For
    soap3dp-view and tests."""
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:4] == MAGIC, "not a soap3dp-tpu succinct file"
    off = 4
    (nchrom,) = struct.unpack_from("<I", data, off)
    off += 4
    names, lens = [], []
    for _ in range(nchrom):
        nl, ln = struct.unpack_from("<HQ", data, off)
        off += 10
        names.append(data[off:off + nl].decode())
        off += nl
        lens.append(ln)
    records = []
    while off < len(data):
        (ql,) = struct.unpack_from("<H", data, off)
        off += 2
        qname = data[off:off + ql]
        off += ql
        flag, chrom, pos, mapq, cl = struct.unpack_from("<HiIBH", data, off)
        off += struct.calcsize("<HiIBH")
        cig = data[off:off + cl].decode()
        off += cl
        (nm,) = struct.unpack_from("<i", data, off)
        off += 4
        records.append((qname, flag, chrom, pos, mapq, cig, nm))
    return names, lens, records


# ------------------------------------------------------------------
# BAM
# ------------------------------------------------------------------

_SEQ_NYBBLE = {65: 1, 67: 2, 71: 4, 84: 8, 78: 15,
               97: 1, 99: 2, 103: 4, 116: 8, 110: 15}
_CIGAR_OP = {"M": 0, "I": 1, "D": 2, "N": 3, "S": 4, "H": 5, "P": 6,
             "=": 7, "X": 8}


def reg2bin(beg: int, end: int) -> int:
    """BAM bin number of [beg, end) — the standard UCSC binning function
    (SAM spec section 5.3; samtools bam.h bam_reg2bin)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def reg2bin_vec(beg: np.ndarray, end: np.ndarray) -> np.ndarray:
    """Vectorized reg2bin over [beg, end) arrays."""
    beg = np.asarray(beg, np.int64)
    e = np.asarray(end, np.int64) - 1
    out = np.zeros(len(beg), np.int32)
    done = np.zeros(len(beg), bool)
    for shift, off in ((14, 4681), (17, 585), (20, 73), (23, 9), (26, 1)):
        hit = ~done & ((beg >> shift) == (e >> shift))
        out[hit] = off + (beg[hit] >> shift)
        done |= hit
    return out


# deflate level: 2 measured 117 MB/s vs level 6's 20 MB/s on record
# data, at ~7% larger output — on a single-core host the BAM writer
# thread competes with the align loop, so speed wins (htslib callers
# make the same tradeoff for intermediate BAMs; override with
# SOAP3DP_BGZF_LEVEL for archival output)
BGZF_LEVEL = int(os.environ.get("SOAP3DP_BGZF_LEVEL", "2"))


_QNAME_WARNED = False


def _cap_qnames(names):
    """BAM caps l_read_name at 255 including the NUL: truncate longer
    qnames with a one-time warning (the reference caps names at its ini
    MaxLenReadName the same way) instead of wrapping the u8 length."""
    global _QNAME_WARNED
    a = np.asarray(names)
    if a.dtype.kind == "S":
        if a.dtype.itemsize <= 254:
            return a
        if np.char.str_len(a).max(initial=0) <= 254:
            return a
        a = np.ascontiguousarray(a)
        capped = np.ascontiguousarray(
            a.view(np.uint8).reshape(len(a), -1)[:, :254]
        ).view("S254").reshape(len(a))
    else:
        if all(len(x) <= 254 for x in names):
            return names
        capped = [x[:254] for x in names]
    if not _QNAME_WARNED:
        import sys
        print("[soap3dp] warning: read names longer than 254 bytes "
              "truncated in BAM output", file=sys.stderr)
        _QNAME_WARNED = True
    return capped


def _bgzf_block(payload: bytes) -> bytes:
    comp = zlib.compressobj(BGZF_LEVEL, zlib.DEFLATED, -15)
    cdata = comp.compress(payload) + comp.flush()
    bsize = len(cdata) + 25 + 1
    header = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff\x06\x00BC\x02\x00"
              + struct.pack("<H", bsize - 1))
    return header + cdata + struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                                        len(payload))

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


class BamWriter:
    """Standard BAM writer (BGZF container, BAM v1 records)."""

    def __init__(self, path, index: Index, read_group="default",
                 sample="default", rg_option=""):
        self._fh = open(path, "wb")
        self._buf = bytearray()
        self.names = [n.encode() for n in index.names]
        lens = np.diff(index.offsets).astype(np.int64)
        text = [b"@HD\tVN:1.3\tSO:unsorted"]
        rg = f"@RG\tID:{read_group}\tSM:{sample}"
        if rg_option:
            rg += "\t" + rg_option
        text.append(rg.encode())
        for name, ln in zip(self.names, lens):
            text.append(b"@SQ\tSN:" + name + f"\tLN:{ln}".encode())
        text.append(f"@PG\tID:soap3dp-tpu\tPN:soap3dp-tpu\tVN:{__version__}".encode())
        text = b"\n".join(text) + b"\n"
        hdr = b"BAM\x01" + struct.pack("<i", len(text)) + text
        hdr += struct.pack("<i", len(self.names))
        for name, ln in zip(self.names, lens):
            hdr += struct.pack("<i", len(name) + 1) + name + b"\x00"
            hdr += struct.pack("<i", int(ln))
        self._emit(hdr)

    def _emit(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= 60000:
            self._fh.write(_bgzf_block(bytes(self._buf[:60000])))
            del self._buf[:60000]

    @staticmethod
    def _cigar_bin(cigar: str) -> tuple[list[int], int]:
        """Binary cigar ops + reference span (for reg2bin)."""
        out = []
        n = span = 0
        for ch in cigar:
            if ch.isdigit():
                n = n * 10 + ord(ch) - 48
            else:
                out.append((n << 4) | _CIGAR_OP[ch])
                if ch in "MDN=X":
                    span += n
                n = 0
        return out, span

    def write(self, rec: SamRecord) -> None:
        if rec.flag & FLAG_REVERSE and not rec.flag & FLAG_UNMAPPED:
            seq = revcomp_ascii(rec.seq)
            qual = rec.qual[::-1] if rec.qual else None
        else:
            seq, qual = rec.seq, rec.qual
        cig, span = self._cigar_bin(rec.cigar) if rec.cigar else ([], 0)
        if rec.chrom >= 0 and rec.pos >= 0:
            bam_bin = reg2bin(rec.pos, rec.pos + max(span, 1))
        else:
            bam_bin = 4680  # reg2bin(-1, 0): the spec's unmapped value
        l_seq = len(seq)
        packed = bytearray((l_seq + 1) // 2)
        for i, b in enumerate(seq):
            nyb = _SEQ_NYBBLE.get(b, 15)
            packed[i // 2] |= nyb << (4 if i % 2 == 0 else 0)
        qdata = bytes(q - 33 for q in qual) if qual else b"\xff" * l_seq
        aux = bytearray()
        for t in rec.tags:
            tag, typ, val = t.split(":", 2)
            if typ == "i":
                aux += tag.encode() + b"i" + struct.pack("<i", int(val))
            else:
                aux += tag.encode() + b"Z" + val.encode() + b"\x00"
        name = bytes(_cap_qnames([rec.qname])[0]) + b"\x00"
        body = struct.pack(
            "<iiBBHHHiiii",
            rec.chrom, rec.pos if rec.chrom >= 0 else -1,
            len(name), rec.mapq & 0xFF, bam_bin,
            len(cig), rec.flag, l_seq,
            rec.mate_chrom, rec.mate_pos if rec.mate_chrom >= 0 else -1,
            rec.tlen)
        body += name
        body += struct.pack(f"<{len(cig)}I", *cig)
        body += bytes(packed) + qdata + bytes(aux)
        self._emit(struct.pack("<i", len(body)) + body)

    def write_block(self, names, flags, chroms, poss, mapqs, cigars, nms, *,
                    mate_chroms=None, mate_poss=None, tlens=None,
                    seq_codes=None, seq_lens=None, quals=None,
                    tags=None, seq_src=None) -> None:
        """Columnar bulk write of N gapless mapped records straight to
        BAM binary — no SAM-text round trip. Byte-identical to the
        per-record ``write`` path (the test asserts this), assembled
        with vectorized numpy scatters like the succinct/SAM block
        writers. cigars are single-op ``<len>M`` entries (the fast
        path guarantees gapless — cigars=None means the same thing and
        is the normal hot-path form); seq_codes is the FORWARD 2-bit
        code matrix (or a (mate1, mate2) pair with seq_src row
        indices), reverse-flagged rows are flipped+complemented in bulk.
        """
        N = len(names)
        if N == 0:
            return
        del nms  # NM only appears on the -p slow path, as in SAM
        if seq_codes is not None and seq_src is not None:
            from soap3dp_tpu.io.sam import _gather_pair
            seq_codes, quals = _gather_pair(seq_codes, quals, seq_src)
        flags = np.asarray(flags, np.int64)
        chroms = np.asarray(chroms, np.int32)
        poss = np.asarray(poss, np.int64)
        lens_a = np.asarray(seq_lens, np.int64)
        L = seq_codes.shape[1]

        from soap3dp_tpu.io.ragged import (flatten_bytes, offsets_of,
                                           scatter_idx)

        names = _cap_qnames(names)
        qlen, nsrc = flatten_bytes(names)
        sb = (lens_a + 1) // 2               # packed-seq bytes
        aux_n = 35 if tags is not None else 0
        # 4 block_size + 32 fixed + name+NUL + one cigar op + seq + qual
        rec_len = 4 + 32 + qlen + 1 + 4 + sb + lens_a + aux_n
        off = offsets_of(rec_len)
        buf = np.zeros(off[-1], np.uint8)
        o = off[:-1]

        def put_u16(pos, val):
            v = np.asarray(val).astype(np.uint16)
            buf[pos] = (v & 0xFF).astype(np.uint8)
            buf[pos + 1] = (v >> 8).astype(np.uint8)

        def put_u32(pos, val):
            v = np.asarray(val).astype(np.int64).astype(np.uint32)
            for k in range(4):
                buf[pos + k] = ((v >> (8 * k)) & 0xFF).astype(np.uint8)

        put_u32(o, rec_len - 4)                       # block_size
        put_u32(o + 4, chroms)                        # refID
        put_u32(o + 8, poss)                          # pos
        buf[o + 12] = (qlen + 1).astype(np.uint8)     # l_read_name
        buf[o + 13] = np.asarray(mapqs, np.uint8)
        put_u16(o + 14, reg2bin_vec(poss, poss + np.maximum(lens_a, 1)))
        put_u16(o + 16, np.ones(N, np.uint16))        # n_cigar_op
        put_u16(o + 18, flags)
        put_u32(o + 20, lens_a)                       # l_seq
        if mate_chroms is None:                       # single-end records
            mc = np.full(N, -1, np.int64)
            mposs = np.full(N, -1, np.int64)
            tlens = np.zeros(N, np.int64)
        else:
            mc = np.asarray(mate_chroms, np.int64)
            mposs = np.asarray(mate_poss, np.int64)
        put_u32(o + 24, mc)
        put_u32(o + 28, np.where(mc >= 0, mposs, -1))
        put_u32(o + 32, np.asarray(tlens, np.int64))

        # ragged name copy + NUL terminator (already zero-filled)
        buf[scatter_idx(o + 36, qlen)] = nsrc
        co = o + 36 + qlen + 1
        put_u32(co, (lens_a << 4))                    # one M op

        # oriented 2-bit codes -> 4-bit nybbles -> byte pairs
        rev = ((flags & FLAG_REVERSE) != 0)[:, None]
        i = np.arange(L, dtype=np.int64)[None, :]
        in_read = i < lens_a[:, None]
        if (lens_a == L).all():
            oc = np.where(rev, seq_codes[:, ::-1], seq_codes)
            qsrc = None
        else:
            qsrc = np.where(rev, np.clip(lens_a[:, None] - 1 - i, 0, L - 1), i)
            oc = np.take_along_axis(np.asarray(seq_codes), qsrc, axis=1)
        oc = np.where(rev, 3 - oc, oc)
        nyb = np.where(in_read, np.uint8(1) << oc.astype(np.uint8), 0)
        Le = L + (L & 1)
        if Le != L:
            nyb = np.concatenate([nyb, np.zeros((N, 1), np.uint8)], axis=1)
        sbytes = (nyb.reshape(N, Le // 2, 2)[:, :, 0] << 4) \
            | nyb.reshape(N, Le // 2, 2)[:, :, 1]
        so = co + 4
        smask = np.arange(Le // 2, dtype=np.int64)[None, :] < sb[:, None]
        buf[scatter_idx(so, sb)] = sbytes[smask]

        qo = so + sb
        if quals is None:
            qbytes = np.full((N, L), 0xFF, np.uint8)
        else:
            q = np.asarray(quals)
            qm = (np.where(rev, q[:, ::-1], q) if qsrc is None
                  else np.take_along_axis(q, qsrc, axis=1))
            qbytes = (qm - 33).astype(np.uint8)
        qmask = np.arange(L, dtype=np.int64)[None, :] < lens_a[:, None]
        buf[scatter_idx(qo, lens_a)] = qbytes[qmask]

        if tags is not None:
            x0, x1, xm = (np.asarray(t, np.int64) for t in tags)
            ao = qo + lens_a
            tmpl = np.frombuffer(
                b"X0i\0\0\0\0X1i\0\0\0\0XMi\0\0\0\0XOi\0\0\0\0XGi\0\0\0\0",
                np.uint8)
            buf[ao[:, None] + np.arange(35, dtype=np.int64)[None, :]] = tmpl
            put_u32(ao + 3, x0)
            put_u32(ao + 10, x1)
            put_u32(ao + 17, xm)
        self._emit(buf.tobytes())

    def close(self):
        if self._buf:
            self._fh.write(_bgzf_block(bytes(self._buf)))
            self._buf.clear()
        self._fh.write(BGZF_EOF)
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
