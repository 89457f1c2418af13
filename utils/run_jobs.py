#!/bin/env python
"""Job-array launcher: Kaldi utils/{run,queue,slurm}.pl equivalents.

Usage: run_jobs.py [--backend local|slurm|sge] JOB=1:N log/do.JOB.log cmd ...

* ``local`` (default, run.pl): substitutes JOB in the command and log path
  and runs the N jobs with a local process pool.
* ``slurm`` (slurm.pl): renders one batch script and submits it as an sbatch
  job array (JOB -> $SLURM_ARRAY_TASK_ID, log JOB -> %a), with CLI options
  (--mem, --num_threads, --time, --gpu, ...) mapped to scheduler flags via a
  Kaldi-format config file (conf/slurm.conf: ``command ...``,
  ``option name=* flags $0``, ``option name=val flags``, ``default name=val``).
* ``sge`` (queue.pl): same, via qsub -t lo-hi (JOB -> $SGE_TASK_ID,
  log JOB -> $TASK_ID).

``--print`` renders the submission (any backend) without running it.
Reference behavior: /root/reference/utils/{run,queue,slurm}.pl +
conf/slurm.conf option mapping.
"""

import argparse
import os
import re
import shlex
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def parse_queue_conf(path):
    """Kaldi queue-config: returns (command, options, defaults) where
    options maps (name, value-pattern) -> flag template ('$0' = CLI value)."""
    command = "sbatch --export=ALL"
    options = {}
    defaults = {}
    if path and Path(path).exists():
        for line in Path(path).read_text().splitlines():
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if line.startswith("command "):
                command = line[len("command "):].strip()
            elif line.startswith("option "):
                body = line[len("option "):]
                key, rest = body.split("=", 1)
                parts = rest.split(None, 1)
                val = parts[0]
                tmpl = parts[1] if len(parts) > 1 else ""
                options[(key.strip(), val)] = tmpl
            elif line.startswith("default "):
                key, val = line[len("default "):].split("=", 1)
                defaults[key.strip()] = val.strip()
    return command, options, defaults


def map_options(cli_opts, options, defaults):
    """CLI {name: value} -> scheduler flag string per the config mapping.

    Kaldi semantics: an exact-value rule wins; else the ``name=*`` rule with
    $0 substituted; a value that matches NO rule emits nothing when it came
    from ``default`` lines (e.g. ``default gpu=0`` with no ``option gpu=0``
    means "add nothing"), and only explicitly-passed CLI options fall through
    to a ``--name value`` passthrough."""
    merged = dict(defaults)
    merged.update(cli_opts)
    flags = []
    for name, value in merged.items():
        if (name, str(value)) in options:  # exact-value rule wins
            tmpl = options[(name, str(value))]
        elif (name, "*") in options:
            tmpl = options[(name, "*")]
        elif name in cli_opts:
            tmpl = f"--{name} $0"
        else:
            continue  # default with no mapping rule: emit nothing
        rendered = tmpl.replace("$0", str(value)).strip()
        if rendered:
            flags.append(rendered)
    return " ".join(flags)


# built-in SGE mapping used when the config file is slurm-flavored (the
# reference ships conf/slurm.conf only; queue.pl's own defaults are these)
_SGE_COMMAND = "qsub -cwd -j y -S /bin/bash -V"
_SGE_OPTIONS = {
    ("name", "*"): "-N $0",
    ("time", "*"): "-l h_rt=$0",
    ("mem", "*"): "-l mem_free=$0,ram_free=$0",
    ("mem", "0"): "",
    ("num_threads", "*"): "-pe smp $0",
    ("num_threads", "1"): "",
    ("gpu", "0"): "",
    ("gpu", "*"): "-l gpu=$0 -q g.q",
}


def build_array_submission(backend, command, flags, name, lo, hi, log, cmd_tokens,
                           max_jobs_run=None):
    """Returns (submit_argv, script_text).  JOB placeholders are rewritten to
    the scheduler's task-id variable; the log path uses the scheduler's
    array-id escape."""
    if backend == "slurm":
        task_var, log_escape = "${SLURM_ARRAY_TASK_ID}", "%a"
        array = f"--array={lo}-{hi}"
        if max_jobs_run:
            array += f"%{max_jobs_run}"
        out_flag = "-o"
    else:  # sge
        task_var, log_escape = "${SGE_TASK_ID}", "$TASK_ID"
        array = f"-t {lo}-{hi}"
        if max_jobs_run:
            array += f" -tc {max_jobs_run}"
        out_flag = "-o"
    log_sched = log.replace(name, log_escape)

    def quote_tok(t):
        """Quote for the batch script while keeping the task-id variable
        expandable: tokens containing JOB use double quotes (escaping the
        shell-active chars) so ${...} still substitutes."""
        if name not in t:
            return shlex.quote(t)
        esc = t.replace("\\", "\\\\").replace('"', '\\"').replace("$", "\\$")
        esc = esc.replace("`", "\\`").replace(name, task_var)
        return f'"{esc}"'

    cmd = " ".join(quote_tok(t) for t in cmd_tokens)
    script = "\n".join([
        "#!/usr/bin/env bash",
        "set -e",
        f"cd {shlex.quote(os.getcwd())}",
        cmd,
        "",
    ])
    submit = shlex.split(command) + shlex.split(flags) + shlex.split(array) + [
        out_flag, log_sched,
    ]
    return submit, script


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("jobspec", help="JOB=1:N range spec")
    parser.add_argument("log", help="log path containing the JOB placeholder")
    parser.add_argument("cmd", nargs=argparse.REMAINDER)
    parser.add_argument("--backend", choices=("local", "slurm", "sge"), default="local")
    parser.add_argument("--config", default="conf/slurm.conf")
    parser.add_argument("--max-jobs-run", type=int, default=None)
    parser.add_argument("--print", dest="print_only", action="store_true")
    # scheduler resource options (Kaldi slurm.pl surface)
    parser.add_argument("--mem", default=None)
    parser.add_argument("--time", default=None)
    parser.add_argument("--num_threads", default=None)
    parser.add_argument("--num_nodes", default=None)
    parser.add_argument("--gpu", default=None)
    args = parser.parse_args(argv)

    m = re.fullmatch(r"(\w+)=(\d+):(\d+)", args.jobspec)
    assert m, f"bad job spec {args.jobspec} (expected NAME=1:N)"
    name, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))

    def render(tokens, j):
        return [t.replace(name, str(j)) for t in tokens]

    if args.backend in ("slurm", "sge"):
        command, options, defaults = parse_queue_conf(args.config)
        if args.backend == "sge" and command.startswith("sbatch"):
            # slurm-flavored config (the shipped conf/slurm.conf): its option
            # templates are sbatch flags, so fall back to queue.pl's built-in
            # SGE mapping instead of inheriting them
            command, options = _SGE_COMMAND, dict(_SGE_OPTIONS)
        cli_opts = {
            k: v
            for k, v in (
                ("name", Path(args.log).name.replace(f".{name}", "").replace(".log", "")),
                ("mem", args.mem),
                ("time", args.time),
                ("num_threads", args.num_threads),
                ("num_nodes", args.num_nodes),
                ("gpu", args.gpu),
            )
            if v is not None
        }
        flags = map_options(cli_opts, options, defaults)
        submit, script = build_array_submission(
            args.backend, command, flags, name, lo, hi, args.log, args.cmd,
            args.max_jobs_run,
        )
        log_dir = Path(args.log.replace(name, "array")).parent
        script_path = log_dir / (Path(args.log).name.replace(f".{name}", "") + ".sh")
        if args.print_only:
            print(" ".join(submit + [str(script_path)]))
            print("---")
            print(script)
            return 0
        log_dir.mkdir(parents=True, exist_ok=True)
        script_path.write_text(script)
        script_path.chmod(0o755)
        r = subprocess.run(submit + [str(script_path)])
        return r.returncode

    jobs = list(range(lo, hi + 1))
    if args.print_only:
        for j in jobs:
            print(" ".join(render(args.cmd, j)))
        return 0

    def run_one(j):
        log = Path(args.log.replace(name, str(j)))
        log.parent.mkdir(parents=True, exist_ok=True)
        cmd = render(args.cmd, j)
        with open(log, "w") as lf:
            r = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT)
        return j, r.returncode

    workers = args.max_jobs_run or len(jobs)
    with ThreadPoolExecutor(workers) as pool:
        results = list(pool.map(run_one, jobs))
    failed = [j for j, rc in results if rc != 0]
    if failed:
        sys.exit(f"jobs failed: {failed} (see {args.log})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
