"""Run the FULL test suite as several sequential pytest processes.

Why: a single ~45-min pytest process has (rarely, but repeatedly) segfaulted
inside XLA *CPU* compilation late in the run — always in a late-alphabet RL
test, always passing in isolation — i.e. the crash depends on accumulated
in-process compile history, not on the test.  Sharding bounds each process's
compile volume; together with the persistent jax compilation cache
(tests/conftest.py) it also makes reruns much faster.

  python tools/run_suite.py            # full suite (-m "") in 3 shards
  python tools/run_suite.py --shards 4 --marker "not slow"
"""

import argparse
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shards", type=int, default=3)
    p.add_argument("--marker", default="",
                   help='pytest -m expression; default "" runs everything')
    p.add_argument("--pytest_args", default="-q")
    args = p.parse_args()

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    # balance by file size (compile volume roughly tracks test volume):
    # biggest-first round-robin over shards
    files.sort(key=os.path.getsize, reverse=True)
    shards = [[] for _ in range(args.shards)]
    sizes = [0] * args.shards
    for f in files:
        i = sizes.index(min(sizes))
        shards[i].append(f)
        sizes[i] += os.path.getsize(f)

    failed = False
    for i, shard in enumerate(shards):
        cmd = [sys.executable, "-m", "pytest", *args.pytest_args.split(),
               "-m", args.marker, *sorted(shard)]
        print(f"=== shard {i + 1}/{args.shards} ({len(shard)} files) ===",
              flush=True)
        rc = subprocess.call(cmd, cwd=REPO)
        if rc != 0:
            failed = True
            print(f"shard {i + 1} FAILED (rc={rc})", flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
