"""Compile and drive the reference index builder for differential tests.

The reference's offline index builder is CUDA-free plain C
(2bwt-flex/2BWT-Builder.c:279, built by `SOAP3-Builder` in the
reference Makefile:78-86), as is the GPU-occ-table converter
(BGS-Build.cpp:85). This module compiles both from the reference tree
into the gitignored `.refbuild/` cache (patching one line that g++ >= 12
rejects outright) and exposes parsers for the index file formats so
tests can assert semantic equivalence with our builder:

* `.bwt`  — u32 inverseSa0, u32 cumulativeFreq[4], then the BWT
  (sentinel row removed) packed 16 chars/word MSB-first
  (BWTLoad, 2bwt-lib/BWT.c:119-192).
* `.sa`   — same header + u32 saInterval + (n+interval)/interval u32
  values; saValue[i] = SA value of row i*interval, row 0 being the
  sentinel suffix with value n (BWTGenerateSaValue,
  BWTConstruct.c:1281-1340) — the same row convention as ours.
* `.pac`  — 4 chars/byte MSB-first, final byte = n % 4
  (ConvertTextToBytePacked, TextConverter.c:251-259).
* `.lkt`  — i32 tableSize, then 4^size u32 cumulative k-mer counts
  over the text padded with k-1 trailing A's (LTConstruct.c:30-106).
  NOTE: tableSize must be >= 10 — the writer emits 1 MiB-word chunks
  (LOOKUP_LOAD_STEP) and overruns its buffer for smaller tables.
* `.fmv.gpu` — u32 inverseSa0, u32 cumulativeFreq[4], then per 128
  text positions 4 u32 cumulative counts with cumFreq folded in
  (BGS-Build.cpp:139-161).
* `.ann`  — text: "n numSeq seed", then per sequence "gi name" and
  "start length 0" lines.
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

REFERENCE = "/root/reference"
REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".refbuild")

_LIB_OBJS = ["BWT", "dictionary", "DNACount", "HSP", "HSPstatistic",
             "iniparser", "inistrlib", "karlin", "MemManager",
             "MiscUtilities", "QSufSort", "r250", "TextConverter", "Timing",
             "Socket", "BWTConstruct"]
_FLEX_OBJS = ["HOCC", "LT", "LTConstruct", "HOCCConstruct"]
# -O0: the 2006-era code trips g++>=12 optimizer UB at -O1 and above
_FLAGS = ["-O0", "-fno-strict-aliasing", "-w", "-fpermissive"]

_INI = """\
[BuildTasks]
ParseFASTA=Y;
BuildLookUp=Y;
BuildBWT=Y;
BuildSaValue=Y;
BuildHOT=N;
[Display]
ShowProgress=N;
[ParseFASTA]
RandomSeed=1;
[BuildBWT]
OccValueFreq=256;
TargetNBit=5;
InitialMaxBuildSize=10000000;
IncMaxBuildSize=10000000;
[BuildSaValue]
SaValueFreq={sa_freq};
[BuildLookUp]
TableSize={table_size};
[Database]
AnnotationFileName=*.index.ann;
AmbiguityFileName=*.index.amb;
PackedDNAFileName=*.index.pac;
BWTCodeFileName=*.index.bwt;
BWTOccValueFileName=*.index.fmv;
SaValueFileName=*.index.sa;
SaIndexFileName=*.index.sai;
RevPackedDNAFileName=*.index.rev.pac;
RevBWTCodeFileName=*.index.rev.bwt;
RevBWTOccValueFileName=*.index.rev.fmv;
LookupTableFileName=*.index.lkt;
RevLookupTableFileName=*.index.rev.lkt;
TranslateFileName=*.index.tra;
"""


def ensure_tools() -> dict | None:
    """Compile (once, cached) the reference builder + BGS-Build.

    Returns {"builder": path, "bgs": path} or None when the reference
    tree or a compiler is unavailable.
    """
    builder = os.path.join(REFBUILD, "soap3-dp-builder")
    bgs = os.path.join(REFBUILD, "bgs-build")
    if os.path.exists(builder) and os.path.exists(bgs):
        return {"builder": builder, "bgs": bgs}
    if not os.path.isdir(os.path.join(REFERENCE, "2bwt-lib")):
        return None
    src = os.path.join(REFBUILD, "src")
    obj = os.path.join(REFBUILD, "obj")
    os.makedirs(obj, exist_ok=True)
    try:
        if not os.path.isdir(src):
            os.makedirs(src)
            subprocess.run(["cp", "-r", f"{REFERENCE}/2bwt-lib",
                            f"{REFERENCE}/2bwt-flex", src], check=True)
            subprocess.run(["cp", f"{REFERENCE}/BGS-Build.cpp",
                            f"{REFERENCE}/definitions.h",
                            f"{REFERENCE}/Release.h", src], check=True)
            # g++ >= 12 hard-errors on this ordered pointer comparison
            subprocess.run(["sed", "-i",
                            "s/bwt->cachedSaIndex > 0/bwt->cachedSaIndex != 0/",
                            os.path.join(src, "2bwt-lib", "BWT.c")], check=True)
        objs = []
        for f in _LIB_OBJS:
            o = os.path.join(obj, f + ".o")
            if not os.path.exists(o):
                subprocess.run(["g++", *_FLAGS, "-c",
                                os.path.join(src, "2bwt-lib", f + ".c"),
                                "-o", o, "-I", src],
                               check=True, capture_output=True)
            objs.append(o)
        for f in _FLEX_OBJS:
            o = os.path.join(obj, f + ".o")
            if not os.path.exists(o):
                subprocess.run(["g++", *_FLAGS, "-c",
                                os.path.join(src, "2bwt-flex", f + ".c"),
                                "-o", o, "-I", src,
                                "-I", os.path.join(src, "2bwt-flex")],
                               check=True, capture_output=True)
            objs.append(o)
        subprocess.run(["g++", *_FLAGS,
                        os.path.join(src, "2bwt-flex", "2BWT-Builder.c"),
                        *objs, "-o", builder, "-I", src,
                        "-I", os.path.join(src, "2bwt-flex"), "-lm"],
                       check=True, capture_output=True)
        subprocess.run(["g++", *_FLAGS, os.path.join(src, "BGS-Build.cpp"),
                        *objs, "-o", bgs, "-I", src, "-lm"],
                       check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    return {"builder": builder, "bgs": bgs}


def build_ref_index(fasta: str, table_size: int = 10,
                    sa_freq: int = 1, gpu_occ: bool = True) -> str | None:
    """Run the reference builder on `fasta`; returns the index prefix."""
    assert table_size >= 10, "reference LUT writer overruns below 10"
    tools = ensure_tools()
    if tools is None:
        return None
    with open(tools["builder"] + ".ini", "w") as fh:
        fh.write(_INI.format(sa_freq=sa_freq, table_size=table_size))
    r = subprocess.run([tools["builder"], fasta], capture_output=True,
                       cwd=os.path.dirname(os.path.abspath(fasta)))
    if r.returncode != 0:
        raise RuntimeError(f"reference builder failed: {r.stdout!r} {r.stderr!r}")
    prefix = fasta + ".index"
    if gpu_occ:
        r = subprocess.run([tools["bgs"], prefix], capture_output=True)
        if r.returncode != 0:
            raise RuntimeError(f"BGS-Build failed: {r.stdout!r} {r.stderr!r}")
    return prefix


# ---------------- file-format parsers ----------------

def read_bwt(prefix: str):
    """-> (inverse_sa0, cumfreq[4], bwt codes uint8[n])."""
    d = np.fromfile(prefix + ".bwt", dtype="<u4")
    inv, cum = int(d[0]), d[1:5].astype(np.int64)
    n = int(cum[3])
    shifts = (np.arange(15, -1, -1, dtype=np.uint32) * 2)
    bwt = ((d[5:, None] >> shifts[None, :]) & 3).astype(np.uint8).reshape(-1)[:n]
    return inv, cum, bwt


def read_sa(prefix: str):
    """-> (interval, sa values uint32[(n+interval)//interval])."""
    d = np.fromfile(prefix + ".sa", dtype="<u4")
    return int(d[5]), d[6:]


def read_pac(prefix: str):
    """-> text codes uint8[n] (4 chars/byte MSB-first; tail byte = n%4)."""
    raw = np.fromfile(prefix + ".pac", dtype=np.uint8)
    rem = int(raw[-1])
    body = raw[:-1]
    shifts = np.array([6, 4, 2, 0], dtype=np.uint8)
    codes = ((body[:, None] >> shifts[None, :]) & 3).astype(np.uint8).reshape(-1)
    n = (len(body) - (1 if rem else 0)) * 4 + rem if rem else len(body) * 4
    return codes[:n]


def read_lkt(prefix: str, rev: bool = False):
    """-> (k, cumulative counts uint32[4^k])."""
    d = np.fromfile(prefix + (".rev.lkt" if rev else ".lkt"), dtype="<u4")
    return int(d[0]), d[1:]


def read_gpu_occ(prefix: str):
    """-> (inverse_sa0, cumfreq[4], occ uint32[nb, 4]) with cumFreq folded."""
    d = np.fromfile(prefix + ".fmv.gpu", dtype="<u4")
    return int(d[0]), d[1:5].astype(np.int64), d[5:].reshape(-1, 4)


def read_ann(prefix: str):
    """-> (n, [(name, start, length), ...])."""
    with open(prefix + ".ann") as fh:
        lines = [l.rstrip("\n") for l in fh]
    n, num_seq, _seed = (int(x) for x in lines[0].split())
    seqs = []
    for i in range(num_seq):
        name = lines[1 + 2 * i].split(None, 1)[1]
        start, length, _ = (int(x) for x in lines[2 + 2 * i].split())
        seqs.append((name, start, length))
    return n, seqs
