"""Command-line interface: ``peapods simulate | bench | sweep``.

Behavior-parity port of ``/root/reference/python/peapods/cli.py`` (same
subcommands, flags, temperature grids, TOML schema, and precedence
CLI > TOML > defaults), rebuilt around a declarative option table instead of
repeated ``add_argument`` blocks.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import tomllib

import numpy as np

from .models.ising import Ising
from .sweep import _flatten_per_disorder_arrays, run_sweep

COUPLING_CHOICES = ["ferro", "bimodal", "gaussian"]
OVERLAP_CLUSTER_CHOICES = ["wolff", "sw"]

# (flag, kwargs builder) shared by simulate/bench; `sweepable` entries are
# re-declared on the sweep subcommand with default=None so the TOML config
# can fill them (precedence CLI > TOML > defaults, cli.py:463-533).
_GEOMETRY_CHOICES = ["triangular", "tri", "fcc", "bcc"]


def _common_options(required_temps: bool):
    req = {"required": True} if required_temps else {"default": None}
    return [
        ("--geometry", dict(choices=_GEOMETRY_CHOICES, help="Named lattice geometry")),
        (
            "--neighbor-offsets",
            dict(
                type=str,
                default=None,
                help="JSON list of offset vectors, e.g. '[[1,0],[0,1]]'",
            ),
        ),
        ("--n-replicas", dict(type=int, default=1 if required_temps else None)),
        ("--n-disorder", dict(type=int, default=1 if required_temps else None)),
        ("--seed", dict(type=int, default=None)),
        ("--temp-min", dict(type=float, **req)),
        ("--temp-max", dict(type=float, **req)),
        ("--n-temps", dict(type=int, default=32 if required_temps else None)),
        (
            "--temp-scale",
            dict(
                default="log" if required_temps else None,
                choices=["linear", "log"],
                help="Temperature spacing (default: log)",
            ),
        ),
        ("--n-sweeps", dict(type=int, **({"required": True} if required_temps else {"default": None}))),
        (
            "--sweep-mode",
            dict(
                default="metropolis" if required_temps else None,
                choices=["metropolis", "gibbs"],
            ),
        ),
        (
            "--cluster-interval",
            dict(type=int, default=None, help="Cluster update every N sweeps"),
        ),
        (
            "--cluster-mode",
            dict(default="sw" if required_temps else None, choices=["sw", "wolff"]),
        ),
        (
            "--cluster-action",
            dict(
                default="update" if required_temps else None,
                choices=["update", "observe"],
            ),
        ),
        (
            "--pt-interval",
            dict(type=int, default=None, help="Parallel tempering every N sweeps"),
        ),
        (
            "--pt-schedule",
            dict(
                default="single_random_edge" if required_temps else None,
                choices=["single_random_edge", "full_ladder"],
            ),
        ),
        (
            "--overlap-cluster-update-interval",
            dict(
                type=int,
                default=None,
                help="Overlap cluster move every N sweeps (requires n_replicas >= 2)",
            ),
        ),
        (
            "--collect-cluster-stats",
            dict(
                action="store_true",
                default=False if required_temps else None,
                help="Collect FK cluster size distribution and top-4 overlap "
                "cluster sizes",
            ),
        ),
        (
            "--autocorrelation-max-lag",
            dict(
                type=int,
                default=None,
                help="Max lag for autocorrelation of m² and q²",
            ),
        ),
        (
            "--autocorrelation-backend",
            dict(
                default="ring" if required_temps else None,
                choices=["ring", "fft"],
                help="Autocorrelation backend (default: ring; FFT retains full "
                "history)",
            ),
        ),
        (
            "--equilibration-diagnostic",
            dict(
                action="store_true",
                default=False if required_temps else None,
                help="Track energy + link-overlap running averages for "
                "equilibration check",
            ),
        ),
    ]


def _apply(parser, options):
    for flag, kw in options:
        parser.add_argument(flag, **kw)


def add_simulation_args(parser):
    parser.add_argument(
        "--shape",
        type=int,
        nargs="+",
        required=True,
        help="Lattice dimensions, e.g. --shape 32 32",
    )
    parser.add_argument(
        "--couplings",
        default="ferro",
        choices=COUPLING_CHOICES,
        help="Coupling distribution (default: ferro)",
    )
    parser.add_argument("--overlap-cluster-build-mode", default="houdayer")
    parser.add_argument(
        "--overlap-cluster-mode", default="wolff", choices=OVERLAP_CLUSTER_CHOICES
    )
    parser.add_argument(
        "--overlap-cluster-action", default="update", choices=["update", "observe"]
    )
    _apply(parser, _common_options(required_temps=True))


def _add_sweep_args(parser):
    parser.add_argument(
        "--config", type=str, default=None, help="Path to TOML config file"
    )
    parser.add_argument(
        "--sizes",
        nargs="+",
        default=None,
        help="Lattice sizes as comma-separated dims, e.g. --sizes 8,8 16,16 8,8,8",
    )
    parser.add_argument(
        "--couplings",
        nargs="+",
        default=None,
        choices=COUPLING_CHOICES,
        help="Coupling distributions to sweep (default: ferro)",
    )
    parser.add_argument("--overlap-cluster-build-mode", nargs="+", default=None)
    parser.add_argument(
        "--overlap-cluster-mode",
        nargs="+",
        default=None,
        choices=OVERLAP_CLUSTER_CHOICES,
    )
    parser.add_argument(
        "--overlap-cluster-action", default=None, choices=["update", "observe"]
    )
    _apply(parser, _common_options(required_temps=False))
    parser.add_argument(
        "--sequential",
        action="store_true",
        default=None,
        help="Layout hint kept for API compatibility (the TPU engine fuses "
        "replica and disorder parallelism on device)",
    )
    parser.add_argument(
        "--snapshot-interval",
        type=int,
        default=None,
        help="Save cluster snapshots every N sweeps (must be multiple of "
        "overlap_cluster interval)",
    )
    parser.add_argument("--warmup-ratio", type=float, default=None)
    parser.add_argument(
        "--autocorrelation-plot-temp",
        type=float,
        default=None,
        help="Temperature at which to plot τ vs L (uses nearest T in grid)",
    )
    parser.add_argument(
        "--save-plots", action="store_true", default=None, help="Save plots to disk"
    )
    parser.add_argument(
        "--save-data", action="store_true", default=None, help="Save data as .npz"
    )
    parser.add_argument(
        "--output-dir", default=None, help="Output directory (default: .)"
    )


def _build_temperatures(args):
    if args.temp_scale == "linear":
        return np.linspace(args.temp_min, args.temp_max, args.n_temps)
    return np.geomspace(args.temp_min, args.temp_max, args.n_temps)


def build_model(args):
    temperatures = _build_temperatures(args)

    neighbor_offsets = None
    if args.neighbor_offsets is not None:
        neighbor_offsets = json.loads(args.neighbor_offsets)

    return Ising(
        tuple(args.shape),
        couplings=args.couplings,
        temperatures=temperatures,
        n_replicas=args.n_replicas,
        n_disorder=args.n_disorder,
        neighbor_offsets=neighbor_offsets,
        geometry=args.geometry,
        seed=args.seed,
    )


def sample_kwargs(args):
    return dict(
        sweep_mode=args.sweep_mode,
        cluster_update_interval=args.cluster_interval,
        cluster_mode=args.cluster_mode,
        cluster_action=args.cluster_action,
        pt_interval=args.pt_interval,
        pt_schedule=args.pt_schedule,
        overlap_cluster_update_interval=args.overlap_cluster_update_interval,
        overlap_cluster_build_mode=args.overlap_cluster_build_mode,
        overlap_cluster_mode=args.overlap_cluster_mode,
        overlap_cluster_action=args.overlap_cluster_action,
        collect_cluster_stats=args.collect_cluster_stats,
        autocorrelation_max_lag=args.autocorrelation_max_lag,
        autocorrelation_backend=args.autocorrelation_backend,
        equilibration_diagnostic=args.equilibration_diagnostic,
    )


_SWEEP_DEFAULTS = dict(
    sizes=None,
    couplings=("ferro",),
    temp_min=None,
    temp_max=None,
    n_temps=32,
    temp_scale="log",
    n_replicas=1,
    n_disorder=1,
    seed=None,
    neighbor_offsets=None,
    geometry=None,
    n_sweeps=None,
    sweep_mode="metropolis",
    cluster_interval=None,
    cluster_mode="sw",
    cluster_action="update",
    pt_interval=None,
    pt_schedule="single_random_edge",
    overlap_cluster_update_interval=None,
    overlap_cluster_build_mode=("houdayer",),
    overlap_cluster_mode=("wolff",),
    overlap_cluster_action="update",
    warmup_ratio=0.25,
    collect_cluster_stats=False,
    autocorrelation_max_lag=None,
    autocorrelation_backend="ring",
    autocorrelation_plot_temp=None,
    equilibration_diagnostic=False,
    save_plots=False,
    save_data=False,
    output_dir=".",
    sequential=False,
    snapshot_interval=None,
)

# TOML section -> (toml key, run_sweep kwarg) mapping (cli.py:355-460)
_TOML_SCHEMA = {
    "lattice": [
        ("geometry", "geometry"),
        ("couplings", "couplings", tuple),
    ],
    "temperatures": [
        ("min", "temp_min"),
        ("max", "temp_max"),
        ("count", "n_temps"),
        ("scale", "temp_scale"),
    ],
    "replicas": [
        ("n_replicas", "n_replicas"),
        ("n_disorder", "n_disorder"),
    ],
    "sampling": [
        ("n_sweeps", "n_sweeps"),
        ("sweep_mode", "sweep_mode"),
        ("warmup_ratio", "warmup_ratio"),
        ("sequential", "sequential"),
        ("seed", "seed"),
    ],
    "cluster": [
        ("interval", "cluster_interval"),
        ("mode", "cluster_mode"),
        ("action", "cluster_action"),
    ],
    "parallel_tempering": [
        ("interval", "pt_interval"),
        ("schedule", "pt_schedule"),
    ],
    "overlap_cluster": [
        ("interval", "overlap_cluster_update_interval"),
        ("build_modes", "overlap_cluster_build_mode", tuple),
        ("snapshot_interval", "snapshot_interval"),
        ("action", "overlap_cluster_action"),
    ],
}


def _load_sweep_config(path):
    with open(path, "rb") as f:
        cfg = tomllib.load(f)

    kw = {}
    for section, entries in _TOML_SCHEMA.items():
        data = cfg.get(section, {})
        for entry in entries:
            toml_key, kwarg = entry[0], entry[1]
            conv = entry[2] if len(entry) > 2 else (lambda v: v)
            if toml_key in data:
                kw[kwarg] = conv(data[toml_key])

    lat = cfg.get("lattice", {})
    if "sizes" in lat:
        kw["sizes"] = [tuple(s) for s in lat["sizes"]]
    if "neighbor_offsets" in lat:
        kw["neighbor_offsets"] = [list(o) for o in lat["neighbor_offsets"]]

    oc = cfg.get("overlap_cluster", {})
    if "cluster_mode" in oc:
        v = oc["cluster_mode"]
        kw["overlap_cluster_mode"] = tuple(v if isinstance(v, list) else [v])

    d = cfg.get("diagnostics", {})
    if "collect_cluster_stats" in d:
        kw["collect_cluster_stats"] = d["collect_cluster_stats"]
    ac = d.get("autocorrelation", {})
    if "max_lag" in ac:
        kw["autocorrelation_max_lag"] = ac["max_lag"]
    if "backend" in ac:
        kw["autocorrelation_backend"] = ac["backend"]
    if "plot_temp" in ac:
        kw["autocorrelation_plot_temp"] = ac["plot_temp"]
    if "equilibration_diagnostic" in d:
        kw["equilibration_diagnostic"] = d["equilibration_diagnostic"]

    out = cfg.get("output", {})
    if "save_plots" in out:
        kw["save_plots"] = out["save_plots"]
    if "save_data" in out:
        kw["save_data"] = out["save_data"]
    if "dir" in out:
        kw["output_dir"] = out["dir"]

    return kw


def run_sweep_cli(args):
    kw = {}
    if args.config is not None:
        kw = _load_sweep_config(args.config)

    cli_fields = [
        "sizes", "couplings", "temp_min", "temp_max", "n_temps", "temp_scale",
        "n_replicas", "n_disorder", "seed", "neighbor_offsets", "geometry",
        "n_sweeps", "sweep_mode", "cluster_interval", "cluster_mode",
        "cluster_action", "pt_interval", "pt_schedule",
        "overlap_cluster_update_interval", "overlap_cluster_build_mode",
        "overlap_cluster_mode", "overlap_cluster_action", "warmup_ratio",
        "collect_cluster_stats", "autocorrelation_max_lag",
        "autocorrelation_backend", "autocorrelation_plot_temp",
        "equilibration_diagnostic", "save_plots", "save_data", "output_dir",
        "sequential", "snapshot_interval",
    ]
    for key in cli_fields:
        val = getattr(args, key)
        if val is not None:
            kw[key] = val

    for key, default in _SWEEP_DEFAULTS.items():
        kw.setdefault(key, default)

    if kw["sizes"] is None:
        print("error: --sizes is required (via CLI or config file)", file=sys.stderr)
        sys.exit(1)
    if kw["temp_min"] is None or kw["temp_max"] is None:
        print(
            "error: --temp-min and --temp-max are required (via CLI or config file)",
            file=sys.stderr,
        )
        sys.exit(1)
    if kw["n_sweeps"] is None:
        print("error: --n-sweeps is required (via CLI or config file)", file=sys.stderr)
        sys.exit(1)

    if isinstance(kw["sizes"][0], str):
        kw["sizes"] = [tuple(int(x) for x in s.split(",")) for s in kw["sizes"]]

    if kw["temp_scale"] == "linear":
        temperatures = np.linspace(kw["temp_min"], kw["temp_max"], kw["n_temps"])
    else:
        temperatures = np.geomspace(kw["temp_min"], kw["temp_max"], kw["n_temps"])

    neighbor_offsets = kw["neighbor_offsets"]
    if isinstance(neighbor_offsets, str):
        neighbor_offsets = json.loads(neighbor_offsets)

    run_sweep(
        kw["sizes"],
        couplings=tuple(kw["couplings"]),
        temperatures=temperatures,
        n_replicas=kw["n_replicas"],
        n_disorder=kw["n_disorder"],
        seed=kw["seed"],
        neighbor_offsets=neighbor_offsets,
        geometry=kw["geometry"],
        n_sweeps=kw["n_sweeps"],
        sweep_mode=kw["sweep_mode"],
        cluster_update_interval=kw["cluster_interval"],
        cluster_mode=kw["cluster_mode"],
        cluster_action=kw["cluster_action"],
        pt_interval=kw["pt_interval"],
        pt_schedule=kw["pt_schedule"],
        overlap_cluster_update_interval=kw["overlap_cluster_update_interval"],
        overlap_cluster_build_modes=tuple(kw["overlap_cluster_build_mode"]),
        overlap_cluster_modes=tuple(kw["overlap_cluster_mode"]),
        overlap_cluster_action=kw["overlap_cluster_action"],
        warmup_ratio=kw["warmup_ratio"],
        collect_cluster_stats=kw["collect_cluster_stats"],
        autocorrelation_max_lag=kw["autocorrelation_max_lag"],
        autocorrelation_backend=kw["autocorrelation_backend"],
        autocorrelation_plot_temp=kw["autocorrelation_plot_temp"],
        equilibration_diagnostic=kw["equilibration_diagnostic"],
        save_plots=kw["save_plots"],
        save_data=kw["save_data"],
        output_dir=kw["output_dir"],
        sequential=kw["sequential"],
        snapshot_interval=kw["snapshot_interval"],
    )


def build_parser():
    parser = argparse.ArgumentParser(
        prog="peapods",
        description="Ising Monte Carlo simulations from the command line "
        "(TPU-native engine).",
    )
    sub = parser.add_subparsers(dest="command")

    sim = sub.add_parser("simulate", help="Run an Ising simulation")
    add_simulation_args(sim)
    sim.add_argument("--warmup-ratio", type=float, default=0.25)
    sim.add_argument(
        "-o", "--output", type=str, default=None, help="Save full results to .npz file"
    )

    bench = sub.add_parser("bench", help="Benchmark sampling performance")
    add_simulation_args(bench)

    sweep = sub.add_parser("sweep", help="Run parameter sweeps with optional plotting")
    _add_sweep_args(sweep)

    return parser


def run_simulate(args):
    model = build_model(args)

    result = model.sample(
        args.n_sweeps,
        **sample_kwargs(args),
        warmup_ratio=args.warmup_ratio,
    )

    has_overlap = hasattr(model, "sg_binder")
    has_csd = hasattr(model, "mean_cluster_size")
    print_table(model, has_overlap, has_csd)

    if args.output:
        save_dict = {
            "temperatures": model.temperatures,
            "binder_cumulant": model.binder_cumulant,
            "heat_capacity": model.heat_capacity,
        }
        for key in (
            "mags",
            "mags2",
            "mags4",
            "energies",
            "energies2",
            "overlap",
            "overlap2",
            "overlap4",
        ):
            if key in result:
                save_dict[key] = result[key]
        if has_overlap:
            save_dict["sg_binder"] = model.sg_binder
        if has_csd:
            save_dict["mean_cluster_size"] = model.mean_cluster_size
        if hasattr(model, "fk_csd"):
            save_dict["fk_csd"] = model.fk_csd
        if hasattr(model, "top_cluster_sizes"):
            save_dict["top_cluster_sizes"] = model.top_cluster_sizes
        if hasattr(model, "per_sample_overlap_histogram"):
            save_dict["per_sample_overlap_histogram"] = (
                model.per_sample_overlap_histogram
            )
        save_dict.update(_flatten_per_disorder_arrays(model.per_disorder))
        np.savez(args.output, **save_dict)
        print(f"\nResults saved to {args.output}")


def run_bench(args):
    model = build_model(args)
    shape_str = "x".join(str(s) for s in args.shape)

    t0 = time.perf_counter()
    model.sample(args.n_sweeps, **sample_kwargs(args), warmup_ratio=0.0)
    elapsed = time.perf_counter() - t0

    per_sweep = elapsed / args.n_sweeps * 1000
    print(
        f"Lattice: {shape_str}  |  Temps: {args.n_temps}  |  Sweeps: {args.n_sweeps}"
    )
    print(f"Total: {elapsed:.3f} s  |  {per_sweep:.3f} ms/sweep")


def print_table(model, has_overlap, has_csd):
    temps = model.temperatures
    energy = model.energies_avg
    binder = model.binder_cumulant
    hcap = model.heat_capacity
    has_top4 = hasattr(model, "top_cluster_sizes")

    cols = [f"{'T':>8}", f"{'E':>10}", f"{'Binder':>10}", f"{'C_v':>10}"]
    if has_overlap:
        cols.append(f"{'Overlap Binder':>15}")
    if has_csd:
        cols.append(f"{'Cluster Size':>14}")
    if has_top4:
        cols.append(f"{'Top-4 Clusters':>30}")

    header = "  ".join(cols)
    print(header)
    print("-" * len(header))

    for i in range(len(temps)):
        row = [
            f"{temps[i]:8.4f}",
            f"{energy[i]:10.6f}",
            f"{binder[i]:10.6f}",
            f"{hcap[i]:10.4f}",
        ]
        if has_overlap:
            row.append(f"{model.sg_binder[i]:15.6f}")
        if has_csd:
            row.append(f"{model.mean_cluster_size[i]:14.2f}")
        if has_top4:
            t = model.top_cluster_sizes[i]
            row.append(f"({t[0]:.3f}, {t[1]:.3f}, {t[2]:.3f}, {t[3]:.3f})".rjust(30))
        print("  ".join(row))


def main():
    parser = build_parser()
    args = parser.parse_args()

    if args.command is None:
        parser.print_help()
        sys.exit(1)

    if args.command == "simulate":
        run_simulate(args)
    elif args.command == "bench":
        run_bench(args)
    elif args.command == "sweep":
        run_sweep_cli(args)


if __name__ == "__main__":
    main()
