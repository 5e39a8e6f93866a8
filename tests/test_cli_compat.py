"""Drop-in CLI compatibility: every command in the reference's demo
scripts (docs/demo_scripts_results/*.sh) must parse cleanly against OUR
argument surface -- a user should be able to re-run their reference
scripts unchanged (SURVEY.md §2.1 contract)."""
import glob
import re
import shlex

import pytest

from rechorus_tpu import registry
from rechorus_tpu.main import parse_global_args

SCRIPTS = sorted(glob.glob("/root/reference/docs/demo_scripts_results/*.sh"))


def reference_commands():
    cmds = []
    for path in SCRIPTS:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("python main.py"):
                    cmds.append((path.split("/")[-1], line))
    return cmds


CMDS = reference_commands()


@pytest.mark.parametrize("script,cmd", CMDS, ids=[f"{s}:{c[16:46]}" for s, c in CMDS])
def test_reference_command_parses(script, cmd):
    import argparse

    tokens = shlex.split(cmd)[2:]  # drop "python main.py"
    tokens = [t for t in tokens if t]
    # ${random_seed} placeholders from the shell scripts
    tokens = [re.sub(r"\$\{random_seed\}", "0", t) for t in tokens]

    init = argparse.ArgumentParser(add_help=False)
    init.add_argument("--model_name", type=str, default="BPRMF")
    init.add_argument("--model_mode", type=str, default="")
    init_args, _ = init.parse_known_args(tokens)

    model_cls = registry.get_model(init_args.model_name, init_args.model_mode)
    reader_cls = registry.get_reader(model_cls.reader)
    runner_cls = registry.get_runner(model_cls.runner)

    parser = argparse.ArgumentParser(parents=[init])
    parser = parse_global_args(parser)
    parser = reader_cls.parse_data_args(parser)
    parser = runner_cls.parse_runner_args(parser)
    parser = model_cls.parse_model_args(parser)
    args, extras = parser.parse_known_args(tokens)
    # flags the reference's OWN parser doesn't define either (its scripts
    # pass them and it warns-and-ignores): PRM/SetRank hardcode
    # positionafter (PRM.py:48); ContraRec has ctc_temp/ccc_temp, not temp
    ref_ignored = {"--positionafter"}
    if init_args.model_name == "ContraRec":
        ref_ignored.add("--temp")
    flag_extras = [e for e in extras if e.startswith("--") and e not in ref_ignored]
    assert not flag_extras, f"{script}: unknown flags {flag_extras} in: {cmd}"
