"""Command-line interface mirroring the reference's command tree
(ref: src/main.rs:9-234): ``index {build,info,union,diff}``, ``filter``,
``server``, ``client``."""

from __future__ import annotations

import argparse
import sys

from .constants import (
    DEFAULT_ABS_THRESHOLD,
    DEFAULT_COMPRESSION_LEVEL,
    DEFAULT_KMER_LENGTH,
    DEFAULT_REL_THRESHOLD,
    DEFAULT_WINDOW_SIZE,
    MAX_K_BUILD,
    MAX_K_DIFF_FASTX,
    TOOL_NAME,
    VERSION,
)


def _abs_threshold(value: str) -> int:
    v = int(value)
    # ref: src/main.rs:44 — clap value_parser!(u16).range(1..), i.e. the u16
    # type bounds the top end too
    if not 1 <= v <= 65535:
        raise argparse.ArgumentTypeError(
            f"{v} is not in 1..=65535"
        )
    return v


def _k_build(value: str) -> int:
    v = int(value)
    if not (1 <= v <= MAX_K_BUILD):  # ref: src/main.rs:166
        raise argparse.ArgumentTypeError(f"{v} is not in 1..={MAX_K_BUILD}")
    return v


def _k_diff(value: str) -> int:
    v = int(value)
    if not (1 <= v <= MAX_K_DIFF_FASTX):  # ref: src/main.rs:223
        raise argparse.ArgumentTypeError(f"{v} is not in 1..={MAX_K_DIFF_FASTX}")
    return v


def _add_filter_like_args(p: argparse.ArgumentParser) -> None:
    """Shared flag surface of filter and client (ref: src/main.rs:24-155)."""
    p.add_argument("input", nargs="?", default="-",
                   help="path to fastx file (or - for stdin)")
    p.add_argument("input2", nargs="?", default=None,
                   help="optional second paired fastx file (or - for interleaved stdin)")
    p.add_argument("-o", "--output", default="-",
                   help="output fastx path (- for stdout; detects .gz/.zst/.xz)")
    p.add_argument("-O", "--output2", default=None,
                   help="optional second paired output fastx path")
    p.add_argument("-a", "--abs-threshold", type=_abs_threshold,
                   default=DEFAULT_ABS_THRESHOLD,
                   help="minimum absolute number of minimizer hits for a match")
    p.add_argument("-r", "--rel-threshold", type=float,
                   default=DEFAULT_REL_THRESHOLD,
                   help="minimum relative proportion (0.0-1.0) of minimizer hits")
    p.add_argument("-p", "--prefix-length", type=int, default=0,
                   help="search only the first N nucleotides (0 = entire sequence)")
    p.add_argument("-d", "--deplete", action="store_true",
                   help="discard matching sequences")
    p.add_argument("-R", "--rename", action="store_true",
                   help="replace sequence headers with incrementing numbers")
    p.add_argument("-s", "--summary", default=None,
                   help="path to JSON summary output file")
    p.add_argument("-t", "--threads", type=int, default=8,
                   help="number of execution threads (0 = auto)")
    p.add_argument("--compression-level", type=int, default=DEFAULT_COMPRESSION_LEVEL,
                   help="output compression level (1-9 gz & xz; 1-22 zstd)")
    p.add_argument("--debug", action="store_true",
                   help="output sequences with minimizer hits to stderr")
    p.add_argument("-q", "--quiet", action="store_true",
                   help="suppress progress reporting")
    p.add_argument("--device", default="auto",
                   choices=["auto", "tpu", "cpu", "numpy"],
                   help="compute backend (TPU-native extension flag)")
    p.add_argument("--mesh", default=None,
                   metavar="DATAxSHARD|pod|pod-data|pod-2d",
                   help="device mesh, e.g. 2x4: reads data-parallel over "
                        "DATA chips, index range-sharded over SHARD chips. "
                        "'pod': jax.distributed multi-host mode (DEACON_COORD/"
                        "DEACON_NUM_PROC/DEACON_PROC_ID env) — every host "
                        "holds only its index slice and must be fed the same "
                        "input. 'pod-data': each host filters its own byte "
                        "range of the input(s) on a rank-local mesh — "
                        "aggregate reads/s scales with hosts (plain or BGZF "
                        "single-end, or plain paired file inputs). 'pod-2d': "
                        "both axes at once — rank groups of DEACON_POD_SHARDS "
                        "hosts each own a byte range while the index shards "
                        "across the hosts within the group (TPU-native "
                        "extension flag)")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog=TOOL_NAME,
        description=(
            "TPU-native minimizer-based filter for nucleotide sequences "
            "in FASTA/FASTQ format"
        ),
    )
    parser.add_argument("--version", action="version", version=f"{TOOL_NAME} {VERSION}")
    sub = parser.add_subparsers(dest="command", required=True)

    # index -------------------------------------------------------------
    p_index = sub.add_parser("index", help="build and compose minimizer indexes")
    isub = p_index.add_subparsers(dest="index_command", required=True)

    p_build = isub.add_parser("build", help="index minimizers within a fastx file")
    p_build.add_argument("input", help="input fastx path (gz/zst/xz supported)")
    p_build.add_argument("-k", dest="kmer_length", type=_k_build,
                         default=DEFAULT_KMER_LENGTH, help="k-mer length (1-57)")
    p_build.add_argument("-w", dest="window_size", type=int,
                         default=DEFAULT_WINDOW_SIZE, help="minimizer window size")
    p_build.add_argument("-o", "--output", default="-", help="output path (- for stdout)")
    p_build.add_argument("-c", "--capacity", dest="capacity_millions", type=int,
                         default=400, help="preallocated capacity in millions")
    p_build.add_argument("-t", "--threads", type=int, default=8)
    p_build.add_argument("-q", "--quiet", action="store_true",
                         help="suppress sequence header output")
    p_build.add_argument("-e", "--entropy-threshold", type=float, default=0.0,
                         help="minimum scaled entropy threshold (0.0-1.0)")
    p_build.add_argument("--device", default="auto",
                         choices=["auto", "tpu", "cpu", "numpy"],
                         help="compute backend (TPU-native extension flag)")
    p_build.add_argument("--mesh", default=None, choices=["pod-data"],
                         help="'pod-data': each rank (DEACON_NUM_PROC/"
                              "DEACON_PROC_ID) indexes its own record-"
                              "aligned byte range of the input and rank 0 "
                              "merges the partial indexes — aggregate build "
                              "throughput scales with hosts (TPU-native "
                              "extension flag)")

    p_info = isub.add_parser("info", help="show index information")
    p_info.add_argument("index", help="path to index file")

    p_union = isub.add_parser("union", help="combine minimizer indexes (A ∪ B…)")
    p_union.add_argument("inputs", nargs="+", help="input index file(s)")
    p_union.add_argument("-o", "--output", default="-")
    p_union.add_argument("-c", "--capacity", dest="capacity_millions", type=int,
                         default=None)

    p_diff = isub.add_parser("diff", help="subtract minimizers (A - B)")
    p_diff.add_argument("first", help="first index file")
    p_diff.add_argument("second", help="second index file or FASTX file (- for stdin)")
    p_diff.add_argument("-k", "--kmer-length", type=_k_diff, default=None)
    p_diff.add_argument("-w", "--window-size", type=int, default=None)
    p_diff.add_argument("-o", "--output", default="-")

    # filter ------------------------------------------------------------
    p_filter = sub.add_parser(
        "filter",
        help="keep or discard fastx records with sufficient minimizer hits",
    )
    p_filter.add_argument("index", help="path to minimizer index file")
    _add_filter_like_args(p_filter)

    # server / client ---------------------------------------------------
    p_server = sub.add_parser(
        "server", help="serve a pre-loaded minimizer index over HTTP"
    )
    p_server.add_argument("index", help="path to minimizer index file")
    p_server.add_argument("-p", "--port", type=int, default=8888)
    p_server.add_argument("--host", default="0.0.0.0")
    p_server.add_argument("--device", default="host", choices=["host", "jax"],
                          help="run membership decisions on the host probe "
                               "(default) or the accelerator")
    p_server.add_argument("--mesh", default=None, metavar="DATAxSHARD|pod",
                          help="shard the index across a device mesh (e.g. "
                               "1x4), or 'pod': across the hosts of a "
                               "jax.distributed pod (DEACON_COORD/"
                               "DEACON_NUM_PROC/DEACON_PROC_ID; rank 0 "
                               "serves HTTP, other ranks mirror its probe "
                               "collectives); implies --device jax")

    p_client = sub.add_parser(
        "client", help="filter by streaming pre-hashed minimizers to a server"
    )
    p_client.add_argument("server_address", help="server address (including port)")
    _add_filter_like_args(p_client)

    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    try:
        if args.command == "index":
            from .index import build as index_ops

            if args.index_command == "build":
                from .config import IndexConfig

                IndexConfig(
                    input_path=args.input,
                    kmer_length=args.kmer_length,
                    window_size=args.window_size,
                    output_path=None if args.output == "-" else args.output,
                    capacity_millions=args.capacity_millions,
                    threads=args.threads,
                    quiet=args.quiet,
                    entropy_threshold=args.entropy_threshold,
                    device=args.device,
                    mesh=args.mesh,
                ).execute()
            elif args.index_command == "info":
                index_ops.info(args.index)
            elif args.index_command == "union":
                index_ops.union(
                    args.inputs,
                    None if args.output == "-" else args.output,
                    args.capacity_millions,
                )
            elif args.index_command == "diff":
                index_ops.diff(
                    args.first,
                    args.second,
                    args.kmer_length,
                    args.window_size,
                    None if args.output == "-" else args.output,
                )
        elif args.command in ("filter", "client"):
            from .config import FilterConfig

            if args.output2 is not None and args.input2 is None:
                print(
                    "Warning: --output2 specified but no second input file "
                    "provided. --output2 will be ignored.",
                    file=sys.stderr,
                )  # ref: src/main.rs:320-324
            FilterConfig(
                minimizers_path=args.index if args.command == "filter" else None,
                server_address=(
                    args.server_address if args.command == "client" else None
                ),
                input_path=args.input,
                input2_path=args.input2,
                output_path=args.output,
                output2_path=args.output2,
                abs_threshold=args.abs_threshold,
                rel_threshold=args.rel_threshold,
                prefix_length=args.prefix_length,
                summary_path=args.summary,
                deplete=args.deplete,
                rename=args.rename,
                threads=args.threads,
                compression_level=args.compression_level,
                debug=args.debug,
                quiet=args.quiet,
                device=args.device,
                mesh=args.mesh,
            ).execute()
        elif args.command == "server":
            from .server.app import run_server

            run_server(args.index, args.port, host=args.host,
                       device=args.device, mesh=args.mesh)
    except BrokenPipeError:
        return 0
    except KeyboardInterrupt:
        print("Interrupted", file=sys.stderr)
        return 130
    except (ValueError, OSError, RuntimeError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
