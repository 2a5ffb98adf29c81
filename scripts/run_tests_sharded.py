#!/usr/bin/env python
"""Run the full pytest suite as N concurrent file-level shards.

pytest-xdist is not installed in this container, so suite-level
parallelism comes from plain process fan-out: test FILES are split into
N shards balanced by their last recorded wall time (falling back to
file size), and each shard runs its own pytest process with a smaller
Spark session (``SPARK_GRAFT_CPUS = 32 / N``) so the shards share the
box instead of oversubscribing it. Shards never split a file, so every
module/session fixture behaves exactly as in a serial run.

Usage:
    python scripts/run_tests_sharded.py            # 4 shards, all tests
    python scripts/run_tests_sharded.py -n 3 -- -m "not slow"

Exit code is non-zero if any shard fails. Per-shard tails and a total
pass/fail rollup print at the end; timings are recorded to
``.shard_times.json`` to balance the next run.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
TIMES_PATH = os.path.join(REPO, ".shard_times.json")


# Files too heavy to schedule whole: split into class-level units so no
# single shard inherits the entire ~15-min chain file. Module/session
# fixtures re-run per unit (cheap: file reads). Unit = (name, pytest args).
SPLITS = {
    "test_gdm_chain.py": [
        ("test_gdm_chain.py::corpus",
         ["tests/test_gdm_chain.py::TestGdmCorpusChain"]),
        ("test_gdm_chain.py::fullchain",
         ["tests/test_gdm_chain.py::TestFullGdmChain"]),
        ("test_gdm_chain.py::rest",
         ["tests/test_gdm_chain.py",
          "--deselect=tests/test_gdm_chain.py::TestGdmCorpusChain",
          "--deselect=tests/test_gdm_chain.py::TestFullGdmChain"]),
    ],
}


def shard_files(n: int) -> list[list[tuple[str, list[str]]]]:
    files = sorted(
        f for f in os.listdir(TESTS) if f.startswith("test_") and f.endswith(".py")
    )
    units: list[tuple[str, list[str]]] = []
    for f in files:
        if f in SPLITS:
            units.extend(SPLITS[f])
        else:
            units.append((f, [os.path.join("tests", f)]))
    try:
        with open(TIMES_PATH) as fh:
            times = json.load(fh)
    except (OSError, ValueError):
        times = {}

    # LPT greedy: heaviest unit first onto the lightest shard
    def weight(u: tuple[str, list[str]]) -> float:
        name = u[0]
        base = name.split("::")[0]
        fallback = os.path.getsize(os.path.join(TESTS, base)) / 1e4
        if "::" in name:
            fallback /= len(SPLITS[base])
        return float(times.get(name, fallback))

    shards: list[tuple[float, list]] = [(0.0, []) for _ in range(n)]
    for u in sorted(units, key=weight, reverse=True):
        i = min(range(n), key=lambda j: shards[j][0])
        w, us = shards[i]
        shards[i] = (w + weight(u), us + [u])
    return [us for _, us in shards if us]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4, help="shard count")
    ap.add_argument("rest", nargs="*", help="extra pytest args after --")
    args = ap.parse_args()
    shards = shard_files(args.n)
    total_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    per = max(2, total_cpus // max(len(shards), 1))
    procs = []
    t0 = time.time()
    for i, units in enumerate(shards):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(per))
        log = os.path.join(REPO, f".shard_{i}.log")
        cmd = [
            sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
            *[a for _, ua in units for a in ua], *args.rest,
        ]
        fh = open(log, "w")
        procs.append(
            (i, units, fh, subprocess.Popen(
                cmd, cwd=REPO, env=env, stdout=fh, stderr=subprocess.STDOUT,
            ), log)
        )
    failed = 0
    passed = failed_n = 0
    for i, units, fh, p, log in procs:
        rc = p.wait()
        fh.close()
        tail = open(log).read().strip().splitlines()
        last = tail[-1] if tail else ""
        names = [u[0] for u in units]
        print(f"shard {i} rc={rc}: {last}   [{', '.join(names)}]")
        mp = re.search(r"(\d+) passed", last)
        mf = re.search(r"(\d+) failed", last)
        passed += int(mp.group(1)) if mp else 0
        failed_n += int(mf.group(1)) if mf else 0
        if rc != 0:
            failed += 1
            print("\n".join(tail[-15:]))
        # record per-unit times when pytest printed a duration; else
        # apportion the shard wall time by file size
        msec = re.search(r"in (\d+(?:\.\d+)?)s", last)
        if msec:
            total = float(msec.group(1))
            sizes = {
                name: os.path.getsize(
                    os.path.join(TESTS, name.split("::")[0])
                ) / (len(SPLITS.get(name.split("::")[0], [])) or 1)
                for name, _ in units
            }
            z = sum(sizes.values()) or 1
            try:
                with open(TIMES_PATH) as fh2:
                    times = json.load(fh2)
            except (OSError, ValueError):
                times = {}
            for name, s in sizes.items():
                times[name] = total * s / z
            with open(TIMES_PATH, "w") as fh2:
                json.dump(times, fh2, indent=1)
    wall = time.time() - t0
    print(
        f"TOTAL: {passed} passed, {failed_n} failed across "
        f"{len(procs)} shards in {wall/60:.1f} min (cpus/shard={per})"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
