"""Fire bench-set batches automatically when the host goes quiet.

The shared host's load is cyclic (minutes-scale waves, documented since
r10); records only fall in quiet windows (multi-core probe ~0.51-0.58 on
this box). Babysitting that by hand wastes a session — this tool polls
the multi-core probe and, whenever it dips under the threshold, runs one
fresh-JVM child per requested set (bench.py child mode, which appends
every reading to BENCH_RECORDS.json and raises records automatically).

Usage:
    python tools/quiet_bench.py v4 v12 [--threshold 0.62] [--max-batches 6]
                                 [--max-minutes 120]

Exits after max-batches successful batches or max-minutes of polling.
Prints one line per probe and per reading; safe to run in the background.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_probe_multi  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(set_key: str) -> dict | None:
    env = {
        **os.environ,
        "SPARK_GRAFT_BENCH_SET": set_key,
        "SPARK_GRAFT_BENCH_REPS": "2",
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = next(
        (ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")),
        None,
    )
    if proc.returncode == 0 and line:
        return json.loads(line)
    return None


def main() -> None:
    argv = sys.argv[1:]

    def opt(name, default, cast):
        if name in argv:
            i = argv.index(name)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    threshold = opt("--threshold", 0.62, float)
    max_batches = opt("--max-batches", 6, int)
    max_minutes = opt("--max-minutes", 120, float)
    sets = argv or ["v4"]

    deadline = time.monotonic() + max_minutes * 60
    batches = 0
    while batches < max_batches and time.monotonic() < deadline:
        probe = _cpu_probe_multi()
        print(f"probe multi={probe}", flush=True)
        if probe is not None and probe <= threshold:
            for set_key in sets:
                r = run_child(set_key)
                if r:
                    print(
                        f"READING {set_key} wall={r['wall']} "
                        f"multi={r.get('cpu_probe_multi_s')}",
                        flush=True,
                    )
                else:
                    print(f"READING {set_key} FAILED", flush=True)
            batches += 1
        else:
            time.sleep(90)
    print(f"done: {batches} batches", flush=True)


if __name__ == "__main__":
    main()
