"""Benchmark CLI — `python -m webgpu_msm_twisted_edwards_tpu.benchmarks <cmd>`.

The terminal analogue of the reference's benchmark dashboard + drivers
(reference: src/ui/AllBenchmarks.tsx, src/submission/miscellaneous/
full_benchmarks.ts and the per-stage benchmark modules).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="webgpu_msm_twisted_edwards_tpu.benchmarks")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_full = sub.add_parser("full", help="end-to-end MSM over powers (full_benchmarks parity)")
    p_full.add_argument("--powers", type=int, nargs="+", default=[16, 17, 18, 19, 20])
    p_full.add_argument("--runs", type=int, default=5)
    p_full.add_argument("--csv", type=str, default=None)
    p_full.add_argument("--save-baseline", action="store_true",
                        help="record this run's steady-state curve as the "
                             "round-over-round regression reference")

    p_dash = sub.add_parser("dashboard", help="race all MSM implementations (UI parity)")
    p_dash.add_argument("--power", type=int, default=16)

    p_batch = sub.add_parser("batch", help="batch MSM (one point set, k scalar vectors) vs one-shot")
    p_batch.add_argument("--power", type=int, default=18)
    p_batch.add_argument("--k", type=int, default=4)
    p_batch.add_argument("--precompute", action="store_true",
                         help="also run the fixed-SRS precomputed mode (merged single-window table)")
    p_batch.add_argument("--pre-chunk", type=int, default=None,
                         help="merged window size c for --precompute (default: fixed_base_config)")
    p_batch.add_argument("--resident", action="store_true",
                         help="pre-stage inputs on device (measure engine, not the host link)")

    p_sweep = sub.add_parser("sweep", help="window-size (chunk_size) sweep on TPU")
    p_sweep.add_argument("--powers", type=int, nargs="+", default=[18, 19, 20])
    p_sweep.add_argument("--chunks", type=int, nargs="+", default=[13, 14, 15, 16])
    p_sweep.add_argument("--runs", type=int, default=3)

    p_scale = sub.add_parser("scaling", help="multi-chip scaling sweep")
    p_scale.add_argument("--power", type=int, default=18)
    p_scale.add_argument("--mode", choices=("points", "batch"), default="points",
                         help="shard ONE MSM's points (latency) or a BATCH of "
                              "MSMs over a fixed SRS (throughput)")

    p_trace = sub.add_parser("trace", help="capture an XProf device trace of one MSM")
    p_trace.add_argument("--power", type=int, default=16)
    p_trace.add_argument("--log-dir", type=str, default="/tmp/msm_trace")

    p_stages = sub.add_parser(
        "stages", help="micro-benchmark: per-stage timing of the production pipeline")
    p_stages.add_argument("--power", type=int, default=20)

    for name in ("mont", "barrett", "barrett-domb", "convert", "decompose",
                 "data-transfer", "add-points", "scalar-mul", "bucket-reduction",
                 "horners-rule", "smtvp", "device-info"):
        sub.add_parser(name, help=f"micro-benchmark: {name}")

    args = ap.parse_args(argv)

    from . import full, micro

    if args.cmd == "full":
        table = full.run(powers=tuple(args.powers), runs=args.runs, csv_path=args.csv,
                         save_baseline=args.save_baseline)
    elif args.cmd == "batch":
        table = full.run_batch(power=args.power, k=args.k, resident=args.resident,
                               precompute=args.precompute, pre_chunk=args.pre_chunk)
    elif args.cmd == "sweep":
        table = full.sweep(powers=tuple(args.powers), chunks=tuple(args.chunks),
                           runs=args.runs)
    elif args.cmd == "dashboard":
        table = micro.dashboard(power=args.power)
    elif args.cmd == "scaling":
        from . import scaling

        table = scaling.run(log2n=args.power, mode=args.mode)
    elif args.cmd == "trace":
        table = micro.trace(power=args.power, log_dir=args.log_dir)
    elif args.cmd == "stages":
        table = micro.stages(power=args.power)
    else:
        fn = {
            "mont": micro.mont_mul,
            "barrett": micro.barrett_mul,
            "barrett-domb": micro.barrett_domb_mul,
            "convert": micro.convert_inputs,
            "decompose": micro.decompose_scalars,
            "data-transfer": micro.data_transfer,
            "add-points": micro.add_points,
            "scalar-mul": micro.scalar_mul,
            "bucket-reduction": micro.bucket_reduction,
            "horners-rule": micro.horners_rule,
            "smtvp": micro.smtvp,
            "device-info": micro.device_info_table,
        }[args.cmd]
        table = fn()
    print()
    print(table.markdown())
    return 0


if __name__ == "__main__":
    sys.exit(main())
