"""Regenerate tests/durations.json — the recorded per-test runtimes that
drive the quick/full test tiering (tests/conftest.py).

Usage:
    python -m pytest tests/ -q --full --durations=0 > /tmp/durations.log
    python tools/make_durations.py /tmp/durations.log

Only 'call' phases count (setup/teardown are shared fixtures).  Tests
missing from the manifest (new tests, renames) default to the QUICK tier,
so the manifest can lag the suite safely; regenerate when the quick tier
drifts past its budget.
"""

import json
import re
import sys


def main(log_path: str, out_path: str = "tests/durations.json") -> None:
    pat = re.compile(r"^([0-9.]+)s call\s+(\S+)")
    durations = {}
    with open(log_path) as f:
        for line in f:
            m = pat.match(line.strip())
            if m:
                durations[m.group(2)] = float(m.group(1))
    if not durations:
        raise SystemExit(f"no '<t>s call <testid>' lines in {log_path} — "
                         f"run pytest with --durations=0")
    with open(out_path, "w") as f:
        json.dump(dict(sorted(durations.items())), f, indent=0,
                  sort_keys=True)
        f.write("\n")
    print(f"{len(durations)} durations -> {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
