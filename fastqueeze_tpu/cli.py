"""Command-line interface.

Capability parity with the reference CLI (SURVEY.md C1/C2, README.md:18-44):
    fastqueeze -i <ref.fa>                build reference index
    fastqueeze -c [ref.fa] -1 A.fq [-2 B.fq] -o out   compress
    fastqueeze -d [ref.fa] out.fqz [-o prefix]        decompress
Options mirror SeqArc's: -t threads, -l lossy factor, -I max insert,
-f force overwrite, -P pipe-out mode, -p output-to-input-dir.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.utils.log import error, info
from fastqueeze_tpu.utils.metrics import DebugInfo


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="fastqueeze",
        description="TPU-native FASTQ compressor (SeqArc-capability rebuild)")
    ap.add_argument("-i", "--index", metavar="REF", help="build index for REF")
    ap.add_argument("-c", "--compress", action="store_true")
    ap.add_argument("-d", "--decompress", action="store_true")
    ap.add_argument("pos", nargs="*", default=[],
                    help="[ref.fa] for -c; [ref.fa] archive for -d")
    ap.add_argument("-1", dest="in1", help="input FASTQ (SE or PE1)")
    ap.add_argument("-2", dest="in2", help="input FASTQ (PE2)")
    ap.add_argument("-o", dest="out", help="output archive / prefix")
    ap.add_argument("-f", dest="force", action="store_true",
                    help="force overwrite")
    ap.add_argument("-t", dest="threads", type=int, default=1,
                    help="worker parallelism (blocks in flight)")
    ap.add_argument("-l", dest="lossy", type=float, default=0.0,
                    help="lossy quality factor (e.g. 1.15)")
    ap.add_argument("-I", dest="max_insr", type=int, default=0,
                    help="max insert size for PE alignment")
    ap.add_argument("-q", dest="bwa", action="store_true",
                    help="accepted for CLI parity (single index type here)")
    ap.add_argument("-P", dest="pipeout", type=int, default=0,
                    choices=[0, 1, 2, 3], help="pipe decompressed reads to "
                    "stdout: 1=SE/PE1 2=PE2 3=interleaved")
    ap.add_argument("-p", dest="indir", action="store_true",
                    help="write output next to input")
    ap.add_argument("--block-mb", type=int, default=50)
    ap.add_argument("--slevel", type=int, default=3)
    ap.add_argument("--qlevel", type=int, default=2)
    ap.add_argument("--stats", action="store_true", help="print debug tables")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    t_start = time.time()
    dbg = DebugInfo()
    try:
        if args.index:
            from fastqueeze_tpu.align.index import build_index
            p = CodecParams()
            out = build_index(args.index, p)
            info(f"index written: {out}")
        elif args.compress:
            if not args.in1:
                error("compress needs -1 <input.fq>")
                return 2
            out = args.out or (os.path.splitext(args.in1)[0])
            if not out.endswith(".fqz"):
                out += ".fqz"
            if args.indir:
                out = os.path.join(os.path.dirname(os.path.abspath(args.in1)),
                                   os.path.basename(out))
            if os.path.exists(out) and not args.force:
                error(f"{out} exists (use -f to overwrite)")
                return 2
            ref = args.pos[0] if args.pos else None
            p = CodecParams(block_size_mb=args.block_mb, slevel=args.slevel,
                            qlevel=args.qlevel, lossy_factor=args.lossy,
                            max_insr=args.max_insr,
                            is_pe=1 if args.in2 else 0)
            if args.in2:
                from fastqueeze_tpu.pipeline.pe import compress_pe
                stats = compress_pe(p, args.in1, args.in2, out,
                                    ref=ref, dbg=dbg)
            else:
                if ref:
                    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
                    stats = compress_se_aligned(p, ref, args.in1, out,
                                                dbg=dbg)
                else:
                    from fastqueeze_tpu.pipeline.driver import compress_se
                    stats = compress_se(p, args.in1, out, dbg=dbg)
            info(f"compressed {stats['raw']:,} -> {stats['compressed']:,} B "
                 f"(ratio {stats['ratio']:.2f}x) in {stats['blocks']} blocks")
        elif args.decompress:
            if len(args.pos) == 2:
                ref, arc = args.pos
            elif len(args.pos) == 1:
                ref, arc = None, args.pos[0]
            else:
                error("decompress needs an archive path")
                return 2
            from fastqueeze_tpu.pipeline.driver import decompress
            outs = decompress(arc, args.out, dbg=dbg, ref=ref,
                              pipeout=args.pipeout, force=args.force,
                              indir=args.indir)
            if outs:
                info("wrote: " + ", ".join(outs))
        else:
            build_parser().print_help()
            return 1
    except (ValueError, FileNotFoundError, EOFError) as e:
        error(str(e))
        return 1
    if args.stats:
        dbg.print()
    info(f"total time {time.time() - t_start:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
