"""Multi-seed experiment harness.

Parity: reference src/exp.py -- reads a command file (run.sh), reruns each
command with seeds base_seed..base_seed+n-1, regex-parses the
`Best Iter(dev)=...` and `Test After Training:` lines from stdout (the log
grammar is an API shared with main.py), appends per-seed rows and a mean
row to a CSV. The run-to-run variance across seeds is the framework's
acceptance band (SURVEY.md §4).

Example:
  python -m rechorus_tpu.exp --in_f run.sh --out_f exp.csv --n 5
"""
from __future__ import annotations

import argparse
import os
import re
import subprocess
import traceback
from typing import List

import numpy as np
import pandas as pd

COLUMNS = ["Model", "Test", "Best Iter", "Time", "Seed", "Run CMD"]


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Run")
    parser.add_argument("--log_dir", nargs="?", default="../log/", help="Log save dir.")
    parser.add_argument("--cmd_dir", nargs="?", default="./", help="Command dir.")
    parser.add_argument("--in_f", nargs="?", default="run.sh", help="Input commands.")
    parser.add_argument("--out_f", nargs="?", default="exp.csv", help="Output csv.")
    parser.add_argument("--base_seed", type=int, default=0, help="Random seed at the beginning.")
    parser.add_argument("--n", type=int, default=5, help="Repeat times of each command.")
    parser.add_argument("--skip", type=int, default=0, help="skip number.")
    parser.add_argument("--gpu", type=str, default="0", help="Kept for CLI parity.")
    parser.add_argument("--inproc", type=int, default=1,
                        help="Run seeds in-process, reusing the compiled epoch/eval "
                             "fns across seeds (only seed 0 pays the XLA compile). "
                             "0 = reference-parity subprocess mode.")
    return parser.parse_args(argv)


def run_inproc(cmd: str, seeds: List[int]) -> List[dict]:
    """All seeds of one command in this process: the corpus, model,
    batchers and the runner's compiled fns are built once (seed only
    affects init + shuffling), so seeds 1..n-1 skip compilation entirely."""
    import os as _os
    import shlex

    from rechorus_tpu import main as main_mod
    from rechorus_tpu import registry

    # same platform re-assert as main.build_parser_and_run: the image's
    # TPU init hook overrides the JAX_PLATFORMS env var, and in-process
    # runs never pass through main's entry point
    plat = _os.environ.get("JAX_PLATFORMS", "")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    tokens = shlex.split(cmd)
    # strip any "python[3] [-m] rechorus_tpu.main|main.py" prefix
    while tokens and not tokens[0].startswith("--"):
        tokens.pop(0)

    import argparse as _ap

    init_parser = _ap.ArgumentParser(add_help=False)
    init_parser.add_argument("--model_name", type=str, default="BPRMF")
    init_parser.add_argument("--model_mode", type=str, default="")
    init_args, _ = init_parser.parse_known_args(tokens)
    model_cls = registry.get_model(init_args.model_name, init_args.model_mode)
    reader_cls = registry.get_reader(model_cls.reader)
    runner_cls = registry.get_runner(model_cls.runner)

    parser = _ap.ArgumentParser(parents=[init_parser])
    parser = main_mod.parse_global_args(parser)
    parser = reader_cls.parse_data_args(parser)
    parser = runner_cls.parse_runner_args(parser)
    parser = model_cls.parse_model_args(parser)
    args, extras = parser.parse_known_args(tokens)
    if args.model_path == "":
        args.model_path = "../model/{}/exp__{}.bin".format(
            init_args.model_name + init_args.model_mode, args.dataset)

    from rechorus_tpu.parallel.distributed import maybe_initialize
    from rechorus_tpu.utils import io as utils

    utils.init_logging(args.log_file, args.verbose)
    maybe_initialize(args)  # multi-host: must precede any other JAX call
    main_mod.enable_compilation_cache(args)
    stack = main_mod.build_stack(args, model_cls, reader_cls, runner_cls)
    infos = []
    for seed in seeds:
        args.random_seed = seed
        _, info = main_mod.train_and_eval(args, *stack, seed)
        print("  seed {}: {} [{} s]".format(seed, info.get("Test", "?"), info.get("Time", "?")),
              flush=True)
        infos.append(info)
    return infos


def find_info(result: List[str]) -> dict:
    """Parse the two trailer lines main.py logs (reference exp.py:37-50)."""
    info = dict()
    for line in result:
        if line.startswith("Best Iter(dev)"):
            squashed = line.replace(" ", "")
            m = re.search(r"BestIter\(dev\)=(\d+)", squashed)
            if m:
                info["Best Iter"] = m.group(1)
            m = re.search(r"\[([\d\.]+)s\]", squashed)
            if m:
                info["Time"] = m.group(1)
        elif line.startswith("Test After Training:"):
            m = re.search(r"\(([\w@:\.\d,]+)\)", line)
            if m:
                info["Test"] = m.group(1)
    return info


def _append_mean_row(df, model_name: str, n: int):
    """Mean-of-last-n-seeds summary row (reference exp.py:62-74)."""
    info = {"Model": model_name}
    tests = [t for t in df["Test"].tolist()[-n:] if isinstance(t, str) and t]
    if tests:
        tuples = [[(m.split(":")[0], float(m.split(":")[1])) for m in t.split(",")]
                  for t in tests]
        info["Test"] = ",".join(
            "{}:{:<.4f}".format(tuples[0][mi][0], np.average([t[mi][1] for t in tuples]))
            for mi in range(len(tuples[0])))
        iters = [int(float(x)) for x in df["Best Iter"].tolist()[-n:]
                 if str(x).replace(".", "").isdigit()]
        if iters:
            info["Best Iter"] = "%.1f" % np.mean(iters)
    df.loc[len(df)] = [info.get(c, "") for c in COLUMNS]


def main(argv=None):
    args = parse_args(argv)
    skip = args.skip

    out_path = os.path.join(args.log_dir, args.out_f)
    df = pd.DataFrame(columns=COLUMNS)
    if os.path.isfile(out_path):
        existing = pd.read_csv(out_path)
        if list(existing.columns) == COLUMNS:
            df = existing

    os.makedirs(args.log_dir, exist_ok=True)
    with open(os.path.join(args.cmd_dir, args.in_f)) as f:
        lines = f.readlines()

    for cmd in lines:
        cmd = cmd.strip()
        if cmd == "" or cmd.startswith("#") or cmd.startswith("export"):
            continue
        m = re.search(r"--model_name (\w+)", cmd)
        model_name = m.group(1) if m else ""

        # in-process multi-seed: one compile, n seeds. Commands that embed
        # ${random_seed} in file names need true per-seed reruns -> subprocess.
        if args.inproc and "${random_seed}" not in cmd and " --random_seed" not in cmd:
            seeds = list(range(args.base_seed, args.base_seed + args.n))
            if skip >= len(seeds):
                skip -= len(seeds)
                seeds = []
            elif skip > 0:
                seeds, skip = seeds[skip:], 0
            if seeds:
                print(cmd, "-> seeds", seeds, "(in-process)")
                try:
                    infos = run_inproc(cmd, seeds)
                except Exception:
                    traceback.print_exc()
                    infos = []
                for info in infos:
                    info["Run CMD"] = cmd
                    if args.n == 1:
                        info["Model"] = model_name
                    df.loc[len(df)] = [info.get(c, "") for c in COLUMNS]
                df.to_csv(out_path, index=False)
                print(df[COLUMNS[:5]])
            if args.n > 1:
                _append_mean_row(df, model_name, args.n)
                print(df[COLUMNS[:5]])
            for _ in range(3):
                df.loc[len(df)] = [""] * len(COLUMNS)
            df.to_csv(out_path, index=False)
            continue

        for i in range(args.base_seed, args.base_seed + args.n):
            try:
                command = cmd
                if " --random_seed" not in command:
                    command += " --random_seed " + str(i)
                if "${random_seed}" in command:
                    command = command.replace("${random_seed}", str(i))
                print(command)
                if skip > 0:
                    skip -= 1
                    continue
                result = subprocess.check_output(command, shell=True, stderr=subprocess.STDOUT)
                result = [line.strip() for line in result.decode("utf-8").split(os.linesep)]
                info = find_info(result)
                info["Seed"] = str(i)
                info["Run CMD"] = command
                if args.n == 1:
                    info["Model"] = model_name
                df.loc[len(df)] = [info.get(c, "") for c in COLUMNS]
                df.to_csv(out_path, index=False)
                print(df[COLUMNS[:5]])
            except Exception:
                traceback.print_exc()
                continue

        if args.n > 1:
            _append_mean_row(df, model_name, args.n)
            print(df[COLUMNS[:5]])
        for _ in range(3):
            df.loc[len(df)] = [""] * len(COLUMNS)
        df.to_csv(out_path, index=False)


if __name__ == "__main__":
    main()
