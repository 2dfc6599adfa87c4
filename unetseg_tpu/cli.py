"""Interactive CLI REPL — same grammar as the reference.

Parity with ``/root/reference/src/main.cpp:51-196``:

    init <engine_cache_path>
    process [-r] <input> <width> <height> [output_dir]
    exit
    help

Directory inputs are walked (recursively with -r), mirroring relative paths
into the output directory; per-file failures do not abort the batch.  A
``--batched`` flag on process enables the TPU throughput path (batch-32
fused inference) — the reference's loop is serial (src/main.cpp:148-164).
"""

from __future__ import annotations

import os
import sys

from unetseg_tpu import engine
from unetseg_tpu.io import raw as raw_io


def print_usage() -> None:
    print("\nMedical Image Segmentation Tool (TPU)")
    print("Commands:")
    print("  init <engine_cache_path> [--cascade <ckpt> [threshold]] - Initialize segmentation engine")
    print("  process [-r] [--batched] [--tta] [--window N] [--per-class] <input> <width> <height> [output_dir] - Process file/directory")
    print("  exit                          - Cleanup and exit")
    print("\nOptions:")
    print("  -r                            - Recursively process directory")
    print("  --batched                     - Use batched TPU inference for directories")
    print("  --tta                         - 8-fold flip/rot90 ensemble inference")
    print("  --window N                    - Native-resolution sliding-window inference")
    print("  --overlap N                   - Window overlap (default N/2; N/2 on a regular")
    print("                                  grid takes the overlap-add fast blend; smaller")
    print("                                  overlap = fewer windows on large images)")
    print("  --per-class                   - Also emit {base}_classes.json (per-class shapes)")
    print("  --fast-emit                   - Batched C++ artifact emission (with --batched)")
    print("  --tier full|mask_json|json    - Artifact set for --batched (default full)")
    print("  --cascade <ckpt> [threshold]  - Route low-margin slices to a stronger model (init)")
    print("  --cascade-disagree <co> <fb> [max_px] - Route on co-model pixel disagreement (init)")
    print("  --cascade-both <co> <fb> [max_px] [margin_thr] - Union router: disagreement OR low margin (init)")
    print("  <input>                       - Path to image file or directory")


def _process_directory(input_path: str, width: int, height: int,
                       output_dir: str, recursive: bool, batched: bool,
                       fast_emit: bool = False, tier: str = "full",
                       per_class: bool = False) -> None:
    print(f"Processing directory: {input_path}")
    print(f"Recursive: {'Yes' if recursive else 'No'}")

    files = raw_io.find_16bit_images(input_path, recursive)
    if not files:
        print("No 16-bit images found in directory")
        return
    print(f"Found {len(files)} images to process")

    out_dirs = []
    for f in files:
        file_output_dir = output_dir
        if recursive:
            rel = os.path.dirname(os.path.relpath(f, input_path))
            file_output_dir = os.path.join(output_dir, rel)
            os.makedirs(file_output_dir, exist_ok=True)
        out_dirs.append(file_output_dir)

    if batched:
        ok, fail = engine.process_batch(
            files, width, height, out_dirs,
            emitter="native" if fast_emit else "cv2", tier=tier,
            per_class=per_class)
    else:
        ok = fail = 0
        for f, d in zip(files, out_dirs):
            print(f"\nProcessing: {f}")
            if engine.process_single_image(f, width, height, d,
                                           per_class=per_class):
                ok += 1
            else:
                fail += 1

    print("\nDirectory processing completed:")
    print(f"  Success: {ok} files")
    print(f"  Failed: {fail} files")


def repl(stdin=None) -> int:
    stdin = stdin or sys.stdin
    initialized = False
    print("Welcome to Medical Image Segmentation Tool")
    print_usage()

    while True:
        print("\n> ", end="", flush=True)
        line = stdin.readline()
        if not line:
            break
        parts = line.split()
        if not parts:
            continue
        cmd = parts[0]

        if cmd == "init":
            if len(parts) < 2:
                print("Error: Missing engine cache path", file=sys.stderr)
                continue
            cache_path = parts[1]
            cascade_ckpt, cascade_thr = None, 1.5
            cascade_router, cascade_co = "margin", None
            cascade_margin_thr = 1.5
            rest = parts[2:]
            if rest and rest[0] == "--cascade":
                if len(rest) < 2:
                    print("Error: --cascade requires a checkpoint path",
                          file=sys.stderr)
                    continue
                cascade_ckpt = rest[1]
                if len(rest) > 2:
                    try:
                        cascade_thr = float(rest[2])
                    except ValueError:
                        print("Error: invalid cascade threshold",
                              file=sys.stderr)
                        continue
            elif rest and rest[0] in ("--cascade-disagree", "--cascade-both"):
                if len(rest) < 3:
                    print(f"Error: {rest[0]} requires <co_ckpt> "
                          "<fallback_ckpt>", file=sys.stderr)
                    continue
                cascade_router = ("disagree" if rest[0] == "--cascade-disagree"
                                  else "both")
                cascade_co, cascade_ckpt = rest[1], rest[2]
                cascade_thr = 106.0  # px; the 10%-budget point under the
                # reproducible crc32-seed protocol (exp_disagree.py,
                # 2026-08-19: pooled min 0.99422 -> 0.99706 at 10% routed)
                if len(rest) > 3:
                    try:
                        cascade_thr = float(rest[3])
                    except ValueError:
                        print("Error: invalid disagreement threshold",
                              file=sys.stderr)
                        continue
                if cascade_router == "both" and len(rest) > 4:
                    # the union's second leg: route when the boundary margin
                    # falls below this (default 1.5, as --cascade)
                    try:
                        cascade_margin_thr = float(rest[4])
                    except ValueError:
                        print("Error: invalid margin threshold",
                              file=sys.stderr)
                        continue
            elif rest and rest[0].startswith("--"):
                # a misspelled cascade flag must not silently initialize a
                # cascade-LESS engine (round-4 review finding)
                print(f"Error: unknown init option {rest[0]!r} (expected "
                      "--cascade / --cascade-disagree / --cascade-both)",
                      file=sys.stderr)
                continue
            if engine.initialize_engine(cache_path,
                                        cascade_ckpt=cascade_ckpt,
                                        cascade_threshold=cascade_thr,
                                        cascade_router=cascade_router,
                                        cascade_co_ckpt=cascade_co,
                                        cascade_margin_threshold=
                                        cascade_margin_thr):
                print("Engine initialized successfully")
                initialized = True
            else:
                print("Engine initialization failed", file=sys.stderr)

        elif cmd == "process":
            if not initialized:
                print("Error: Engine not initialized", file=sys.stderr)
                continue
            args = parts[1:]
            recursive = batched = tta = per_class = fast_emit = False
            window = overlap = None
            tier, tier_explicit = "full", False
            flag_error = False
            while args and args[0] in ("-r", "--batched", "--tta", "--window",
                                       "--overlap", "--per-class",
                                       "--fast-emit", "--tier"):
                flag = args.pop(0)
                if flag == "-r":
                    recursive = True
                elif flag == "--batched":
                    batched = True
                elif flag == "--tta":
                    tta = True
                elif flag in ("--window", "--overlap"):
                    if not args:
                        break
                    try:
                        val = int(args.pop(0))
                    except ValueError:
                        # a bad value must not traceback out of the REPL
                        print(f"Error: {flag} requires an integer",
                              file=sys.stderr)
                        flag_error = True
                        break
                    if flag == "--window":
                        window = val
                    else:
                        overlap = val
                elif flag == "--per-class":
                    per_class = True
                elif flag == "--fast-emit":
                    fast_emit = True
                elif flag == "--tier":
                    if not args:
                        break
                    tier, tier_explicit = args.pop(0), True
            if flag_error:
                continue
            if tier not in engine.ARTIFACT_TIERS:
                print(f"Error: --tier must be one of "
                      f"{'|'.join(engine.ARTIFACT_TIERS)}", file=sys.stderr)
                continue
            if len(args) < 3:
                print("Error: Invalid process command", file=sys.stderr)
                continue
            input_path = args[0]
            try:
                width, height = int(args[1]), int(args[2])
            except ValueError:
                print("Error: Invalid process command", file=sys.stderr)
                continue
            output_dir = args[3] if len(args) > 3 else os.path.dirname(input_path)
            os.makedirs(output_dir or ".", exist_ok=True)

            try:
                if os.path.isdir(input_path):
                    # flags the batched directory path cannot honor must
                    # error, not silently drop (round-4 review finding)
                    dropped = [n for n, v in (("--tta", tta),
                                              ("--window", window),
                                              ("--overlap", overlap))
                               if v]
                    if dropped:
                        print(f"Error: {dropped} not supported for "
                              "directory inputs (batched path)",
                              file=sys.stderr)
                        continue
                    _process_directory(
                        input_path, width, height, output_dir, recursive,
                        batched, fast_emit, tier, per_class
                    )
                elif os.path.isfile(input_path):
                    dropped = [n for n, v in (("--batched", batched),
                                              ("--fast-emit", fast_emit),
                                              ("--tier", tier_explicit),
                                              ("-r", recursive)) if v]
                    if dropped:
                        print(f"Error: {dropped} apply to directory "
                              "inputs only", file=sys.stderr)
                        continue
                    print(f"Processing file: {input_path}")
                    if engine.process_single_image(
                        input_path, width, height, output_dir,
                        tta=tta, window=window, overlap=overlap,
                        per_class=per_class,
                    ):
                        print("Processing completed")
                    else:
                        print("Processing failed", file=sys.stderr)
                else:
                    print(
                        "Error: Input path is not a valid file or directory",
                        file=sys.stderr,
                    )
            except Exception as e:
                print(f"Processing error: {e}", file=sys.stderr)

        elif cmd == "exit":
            if initialized:
                engine.cleanup_resources()
            print("Exiting...")
            break

        elif cmd == "help":
            print_usage()

        else:
            print(f"Unknown command: {cmd}", file=sys.stderr)

    return 0


def main() -> int:
    """REPL by default; ``--serve [HOST:]PORT`` starts the TCP service
    (unetseg_tpu/service.py), ``--device-post`` fuses mask cleanup on
    device for the service, ``--timeout S`` bounds each process request."""
    argv = sys.argv[1:]
    if argv and argv[0] == "--serve":
        from unetseg_tpu import service

        host, port = "127.0.0.1", 8473
        if len(argv) > 1 and not argv[1].startswith("--"):
            spec = argv[1]
            host, sep, p = spec.rpartition(":")
            if not sep:           # bare "PORT" (no colon)
                host, p = "127.0.0.1", spec
            host = host or "127.0.0.1"
            # IPv6 literal: accept the standard [addr]:port form (a bare
            # ::1:8473 is ambiguous — rpartition would mis-split it)
            if host.startswith("[") and host.endswith("]"):
                host = host[1:-1]
            elif ":" in host:
                print(f"Error: IPv6 --serve addresses need brackets: "
                      f"[{host}]:{p}", file=sys.stderr)
                return 2
            try:
                port = int(p)
            except ValueError:
                print(f"Error: invalid --serve address '{spec}' "
                      "(expected [HOST:]PORT)", file=sys.stderr)
                return 2
        timeout_s = None
        if "--timeout" in argv:
            i = argv.index("--timeout")
            try:
                timeout_s = float(argv[i + 1])
            except (IndexError, ValueError):
                print("Error: --timeout requires a number of seconds",
                      file=sys.stderr)
                return 2
        partitions = 1
        if "--partitions" in argv:
            i = argv.index("--partitions")
            try:
                partitions = int(argv[i + 1])
            except (IndexError, ValueError):
                print("Error: --partitions requires an integer",
                      file=sys.stderr)
                return 2
        service.serve(host, port,
                      device_postprocess="--device-post" in argv,
                      request_timeout_s=timeout_s,
                      partitions=partitions)
        return 0
    return repl()


if __name__ == "__main__":
    sys.exit(main())
